# Developer entry points. The package itself needs no build step (the native
# engine auto-builds on first import of osqp_tpu.native).

PY ?= python

.PHONY: test test-tpu bench native clean

# full suite on an 8-virtual-device CPU mesh (conftest forces the platform)
test:
	PALLAS_AXON_POOL_IPS= $(PY) -m pytest tests/ -q

# conformance suites on the real TPU chip (needs the axon tunnel up)
test-tpu:
	TPUQP_TEST_PLATFORM=tpu $(PY) -m pytest tests/test_basic.py \
	  tests/test_polishing.py tests/test_warm_start.py \
	  tests/test_infeasibility.py tests/test_non_convex.py -q

# headline benchmark on the real chip; prints one JSON line on stdout
bench:
	$(PY) bench.py

native:
	sh native/build.sh

clean:
	rm -f native/libtpuqp.so
	find . -name __pycache__ -type d -prune -exec rm -rf {} \;
