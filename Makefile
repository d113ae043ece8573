.PHONY: test bench clean format native

native:
	g++ -O3 -fopenmp -shared -fPIC -std=c++17 -o bayesian_ensembling_tpu/native/libbetdtw.so bayesian_ensembling_tpu/native/dtw.cpp

test:
	python -m pytest tests/ -q

test-par:
	python -m pytest -n auto -q tests/

bench:
	python bench.py

cpu-baseline:
	python benchmarks/cpu_baseline.py

format:
	python -m black bayesian_ensembling_tpu tests experiments 2>/dev/null || true
	python -m isort bayesian_ensembling_tpu tests experiments 2>/dev/null || true

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

docs:  ## Build Sphinx HTML docs (requires: pip install sphinx furo myst-parser sphinxcontrib-bibtex)
	sphinx-build -b html docs docs/_build/html

docs-fallback:  ## Build static HTML docs with the stdlib-only builder (no sphinx needed)
	python docs/build_fallback.py
