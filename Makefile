# Build orchestration (reference parity: /root/reference/Makefile)
# Targets: install (native lib), compile (circuit setup -> artifacts),
# test, artifacts (manifest), bench.

NLEVELS ?= 16
ENVIRONMENT ?= dev

.PHONY: all install compile test artifacts bench clean

all: install compile

install:
	$(MAKE) -C native

compile: install
	python -m scripts.compile_circuit --nlevels $(NLEVELS) --env $(ENVIRONMENT)

test:
	python -m pytest tests/ -x -q

artifacts:
	python -c "from zkfranchise_tpu.utils.artifacts import write_manifest; \
	import pathlib; write_manifest(pathlib.Path('artifacts/zkCensus/$(ENVIRONMENT)'))"

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache
