"""Complex arrays as (re, im) pairs of real arrays.

TPU backends (XLA:TPU / Mosaic) have no complex dtype support on the compute
path, so the entire solver is written against this split representation: a
``C`` NamedTuple holding two real arrays. All complex algebra is spelled out
in real arithmetic, which is exactly what numpy's complex128 kernels do
internally, so the CPU float64 path reproduces the reference NumPy solver
(cesar-rocha/niwqg, ``niwqg/Kernel.py``) to rounding error.

``C`` is a pytree (NamedTuple), so it threads transparently through
``jax.jit``, ``lax.scan``, ``shard_map`` and friends.

Convention: in mixed products with a real jax array, keep the ``C`` operand
on the LEFT (``phi.conj() * q_psi``). An array on the left only works
because ``jax.Array.__mul__`` currently returns ``NotImplemented`` for a
tuple subclass so Python falls back to ``C.__rmul__`` — JAX has rejected
tuple operands with ``TypeError`` in other versions, so don't rely on it.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp
import numpy as np

Scalar = Union[int, float, complex]


class C(NamedTuple):
    """A complex array represented as a pair of real arrays."""

    re: jnp.ndarray
    im: jnp.ndarray

    # -- construction -----------------------------------------------------
    @staticmethod
    def from_complex(z, dtype=None) -> "C":
        z = np.asarray(z)
        re, im = np.real(z), np.imag(z)
        if dtype is not None:
            re, im = re.astype(dtype), im.astype(dtype)
        return C(jnp.asarray(re), jnp.asarray(im))

    @staticmethod
    def from_real(x) -> "C":
        x = jnp.asarray(x)
        return C(x, jnp.zeros_like(x))

    @staticmethod
    def zeros(shape, dtype) -> "C":
        z = jnp.zeros(shape, dtype)
        return C(z, z)

    def to_complex(self):
        """Host-side conversion to a numpy complex array (debug/IO only)."""
        return np.asarray(self.re) + 1j * np.asarray(self.im)

    # -- unary ------------------------------------------------------------
    def conj(self) -> "C":
        return C(self.re, -self.im)

    def abs2(self) -> jnp.ndarray:
        """|z|^2 as a real array."""
        return self.re * self.re + self.im * self.im

    def __neg__(self) -> "C":
        return C(-self.re, -self.im)

    @property
    def real(self) -> jnp.ndarray:
        return self.re

    @property
    def imag(self) -> jnp.ndarray:
        return self.im

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    # -- binary -----------------------------------------------------------
    def __add__(self, other) -> "C":
        if isinstance(other, C):
            return C(self.re + other.re, self.im + other.im)
        if isinstance(other, complex):
            return C(self.re + other.real, self.im + other.imag)
        return C(self.re + other, self.im)

    __radd__ = __add__

    def __sub__(self, other) -> "C":
        if isinstance(other, C):
            return C(self.re - other.re, self.im - other.im)
        if isinstance(other, complex):
            return C(self.re - other.real, self.im - other.imag)
        return C(self.re - other, self.im)

    def __rsub__(self, other) -> "C":
        return (-self) + other

    def __mul__(self, other) -> "C":
        if isinstance(other, C):
            return C(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        if isinstance(other, complex):
            a, b = other.real, other.imag
            return C(self.re * a - self.im * b, self.re * b + self.im * a)
        # real scalar or real array
        return C(self.re * other, self.im * other)

    __rmul__ = __mul__

    def __truediv__(self, other) -> "C":
        if isinstance(other, C):
            d = other.abs2()
            return C(
                (self.re * other.re + self.im * other.im) / d,
                (self.im * other.re - self.re * other.im) / d,
            )
        if isinstance(other, complex):
            d = other.real * other.real + other.imag * other.imag
            return C(
                (self.re * other.real + self.im * other.imag) / d,
                (self.im * other.real - self.re * other.imag) / d,
            )
        return C(self.re / other, self.im / other)

    # -- indexing / shaping ------------------------------------------------
    def __getitem__(self, idx) -> "C":
        return C(self.re[idx], self.im[idx])

    def at_set(self, idx, value) -> "C":
        """Functional update: z.at[idx].set(value)."""
        if isinstance(value, C):
            return C(self.re.at[idx].set(value.re), self.im.at[idx].set(value.im))
        if isinstance(value, complex):
            return C(self.re.at[idx].set(value.real), self.im.at[idx].set(value.imag))
        return C(self.re.at[idx].set(value), self.im.at[idx].set(jnp.zeros_like(self.im[idx]) if hasattr(self.im[idx], "shape") else 0.0))

    def reshape(self, *shape) -> "C":
        return C(self.re.reshape(*shape), self.im.reshape(*shape))

    def astype(self, dtype) -> "C":
        return C(self.re.astype(dtype), self.im.astype(dtype))

    # -- reductions --------------------------------------------------------
    def mean(self, axis=None) -> "C":
        return C(jnp.mean(self.re, axis=axis), jnp.mean(self.im, axis=axis))

    def sum(self, axis=None) -> "C":
        return C(jnp.sum(self.re, axis=axis), jnp.sum(self.im, axis=axis))


def mul_i(z: C, k) -> C:
    """(i*k) * z for a real array/scalar k — spectral derivative helper.

    Avoids materialising a zero real plane for purely imaginary multipliers
    (the reference's ``self.ik``/``self.il``, ``niwqg/Kernel.py:247-248``).
    """
    return C(-k * z.im, k * z.re)


def jmul(z: C, s: float = 1.0) -> C:
    """(i*s) * z for scalar s."""
    return C(-s * z.im, s * z.re)


def stack(cs, axis=0) -> C:
    """Stack a list of C arrays along a new leading axis (for batched FFTs)."""
    return C(
        jnp.stack([c.re for c in cs], axis=axis),
        jnp.stack([c.im for c in cs], axis=axis),
    )


def unstack(c: C, n: int, axis=0):
    """Inverse of :func:`stack`."""
    res = jnp.split(c.re, n, axis=axis)
    ims = jnp.split(c.im, n, axis=axis)
    return [
        C(jnp.squeeze(r, axis=axis), jnp.squeeze(i, axis=axis))
        for r, i in zip(res, ims)
    ]
