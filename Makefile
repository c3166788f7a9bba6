# Developer targets (the reference ships a cookiecutter Makefile; these are
# the useful equivalents for this repo).

.PHONY: test test-fast lint bench bench-extract native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

lint:
	python -m compileall -q phantom_vlb_tpu bench.py bench_extract.py __graft_entry__.py

native:
	$(MAKE) -C native/decode

bench:
	python bench.py

bench-extract:
	python bench_extract.py

clean:
	rm -rf .jax_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
	$(MAKE) -C native/decode clean
