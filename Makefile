# Developer entry points (the reference gated on ruff format/check,
# reference: Makefile:1-7; this repo gates on the test suite + native build).

.PHONY: test test-fast native bench clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow" -x

native:
	$(MAKE) -C native

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
