.PHONY: test bench example

test:
	env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ -q

bench:
	python bench.py

example:
	env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/LambDipole.py
