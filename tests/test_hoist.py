"""utils.hoist: constants leave the jaxpr and results stay identical."""

import jax
import jax.numpy as jnp
import numpy as np

from niwqg_tpu.utils.hoist import hoist


def test_hoist_extracts_constants_and_preserves_values():
    big = jnp.asarray(np.random.default_rng(0).standard_normal((64, 64)))

    def f(x):
        return (x * big).sum() + big[0, 0]

    x = jnp.ones((64, 64))
    g, consts = hoist(f, x)
    assert len(consts) >= 1
    assert any(np.asarray(c).shape == (64, 64) for c in consts)
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(g(consts, x)))
    # jitted with consts as args: no large literals in the module
    jitted = jax.jit(g)
    np.testing.assert_allclose(np.asarray(jitted(consts, x)),
                               np.asarray(f(x)), rtol=1e-12)


def test_hoist_pytree_in_out():
    w = jnp.asarray(np.arange(12.0).reshape(3, 4))

    def f(d):
        return {"a": d["x"] @ w.T, "b": (d["x"].sum(), w[0])}

    d = {"x": jnp.ones((2, 4))}
    g, consts = hoist(f, d)
    out = g(consts, d)
    ref = f(d)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(ref["a"]))
    assert float(out["b"][0]) == float(ref["b"][0])
