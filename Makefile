# Convenience targets (the reference drives runs through a makefile too,
# reference makefile:2-7 — mpiexec there, plain python + jax here).
PYTHON ?= python
CASE ?= taylor-green
ARGS ?=

.PHONY: run_case test bench bench-small bench-scaling smoke

# REQUIRED after any commit touching a Pallas kernel, engine default, or
# preconditioner: compiles + runs the flagship bench configs on the real
# backend (CPU pytest cannot catch Mosaic compile failures — see smoke.py)
smoke:
	$(PYTHON) smoke.py

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
