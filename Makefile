# Developer targets (parity with the reference's Makefile: test / benchmark /
# format / docs).

.PHONY: test test-fast bench native clean docs

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not parallel and not chains_mv"

bench:
	python bench.py

native:
	g++ -O3 -std=c++17 -shared -fPIC \
	  -o cortex_tpu/native/_signal_core.so cortex_tpu/native/signal_core.cpp

docs:
	@ls docs/*.md

clean:
	rm -rf cortex_tpu/native/_signal_core.so **/__pycache__ .pytest_cache
