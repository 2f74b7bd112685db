.PHONY: test bench example acceptance acceptance-qg

test:
	env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ -q

bench:
	python bench.py

example:
	env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/LambDipole.py

# production-size budget-closure acceptance on the default backend
# (chip f32; set JAX_PLATFORMS=cpu for the f64 twin). ~5 min at 2048^2.
acceptance:
	python scripts/acceptance_r5.py run acceptance_leg.npz

acceptance-qg:
	python scripts/acceptance_r5.py run-qg acceptance_qg_leg.npz
