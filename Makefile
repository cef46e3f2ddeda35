# Fast local test run: strip the axon TPU tunnel env (its PJRT plugin slows
# every XLA compile ~80x even on the CPU backend) and force the CPU platform
# with a virtual 8-device mesh for the sharding tests.
test:
	env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
	  python -m pytest tests/ -x -q

test-all:
	env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
	  python -m pytest tests/ -q

bench:
	python bench.py

.PHONY: test test-all bench
