# Convenience targets (the reference drives runs through a makefile too,
# reference makefile:2-7 — mpiexec there, plain python + jax here).
PYTHON ?= python
CASE ?= taylor-green
ARGS ?=

.PHONY: run_case test bench bench-small bench-scaling

run_case:
	$(PYTHON) -m pynama_tpu.run_case -case $(CASE) $(ARGS)

test:
	$(PYTHON) -m pytest tests/ -q

bench:
	$(PYTHON) bench.py

bench-small:
	PYNAMA_BENCH=small $(PYTHON) bench.py

bench-scaling:
	PYNAMA_BENCH=scaling $(PYTHON) bench.py
