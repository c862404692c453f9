# Task runner — the reference's CMake targets mapped to this repo
# (build/test/doc/install, CMakeLists.txt:26-231). The Python package needs
# no compile step; `oracle` builds the native C++ RNG oracle used by the
# bit-exactness tests.

PY ?= python
CPU_ENV = JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test test-fast bench bench-all oracle docs install clean

test:
	$(CPU_ENV) $(PY) -m pytest tests/ -q

test-fast:
	$(CPU_ENV) $(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

bench-all:
	$(PY) bench_all.py

oracle:
	$(PY) -c "from cl_ops_tpu import native; assert native.available(); print('oracle built')"

docs:
	@ls docs/*.md

install:
	$(PY) -m pip install -e .

clean:
	rm -rf build dist *.egg-info cl_ops_tpu/native/*.so .jax_cache
