"""Traced-program snapshot cache (jax.export) for warm-start latency.

The persistent XLA compilation cache only skips BACKEND compilation —
every process still pays Python tracing + StableHLO lowering for each
program, which for the big MSM chunk programs is most of the warm-start
time (~270 s of a 290 s warm bench start at r5).  jax.export serializes
the traced/lowered program; deserializing it costs ~0 s and the backend
compile then comes from the XLA cache.

Safety: the cache key includes a hash of this package's source files —
any code change invalidates the snapshots automatically.  Pallas
custom calls require the non-stable-custom-call safety check to be
disabled; snapshots are therefore only valid for this exact
jax/libtpu install (the key includes jax.__version__).  Any failure
falls back to the plain jitted callable.
"""
from __future__ import annotations

import hashlib
import pathlib

_SRC_HASH = None


def _code_version() -> str:
    global _SRC_HASH
    if _SRC_HASH is None:
        import jax
        root = pathlib.Path(__file__).resolve().parent.parent
        h = hashlib.sha256(jax.__version__.encode())
        for p in sorted(root.rglob("*.py")):
            h.update(p.read_bytes())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def exported_call(name: str, jit_f, example_args: tuple,
                  cache_dir: str | pathlib.Path):
    """Returns a callable equivalent to jit_f(*example_args)'s program
    (positional args of the same shapes), snapshot-cached on disk.
    Falls back to jit_f on any export/deserialize failure."""
    import jax
    from jax import export as jexport

    cache_dir = pathlib.Path(cache_dir)
    sig = ",".join(
        f"{tuple(a.shape)}:{a.dtype}" if hasattr(a, "shape") else repr(a)
        for a in jax.tree_util.tree_leaves(example_args))
    key = hashlib.sha256(
        f"{name}|{sig}|{_code_version()}".encode()).hexdigest()[:24]
    path = cache_dir / f"{name}_{key}.jaxexp"
    try:
        if path.exists():
            exp = jexport.deserialize(path.read_bytes())
            return exp.call
        exp = jexport.export(
            jit_f,
            disabled_checks=[
                jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")],
        )(*example_args)
        cache_dir.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(exp.serialize())
        tmp.replace(path)
        return exp.call
    except Exception:                                    # noqa: BLE001
        return lambda *a: jit_f(*a)
