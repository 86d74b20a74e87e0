# Mirrors the reference's Makefile targets (test-python etc.) for this
# framework: hermetic CPU tests, native engine build, benchmark.

PYTHON ?= python

.PHONY: test test-fast native bench clean lint

test:
	$(PYTHON) -m pytest tests/ -x -q

test-fast:
	$(PYTHON) -m pytest tests/ -x -q -k "not recall and not sharded"

native:
	$(PYTHON) -c "from instant_distance_tpu.native import available, load_error; \
	  ok = available(); print('native engine:', 'ok' if ok else load_error()); \
	  import sys; sys.exit(0 if ok else 1)"

bench:
	$(PYTHON) bench.py

clean:
	rm -f instant_distance_tpu/native/libidtpu_*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
