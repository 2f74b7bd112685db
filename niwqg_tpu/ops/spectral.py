"""Spectral-space operator helpers shared by all models.

Pure functions over :class:`~niwqg_tpu.carray.C` pairs. The pseudospectral
products (Jacobians) follow the reference formulations:
``jacobian_psi_q`` (``niwqg/Kernel.py:471-486``), ``jacobian_psi_phi``
(``niwqg/Kernel.py:457-469``), ``jacobian_phic_phi``
(``niwqg/CoupledModel.py:59-73``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..carray import C, jmul, mul_i


def hermitian_project(zh: C) -> C:
    """Project a full-spectrum transform onto the Hermitian subspace:
    ``(Z + Z*(-k,-l))/2`` — exactly what the reference's
    ``fft(real(ifft(Z)))`` sandwich computes (``CoupledModel.py:91-94``),
    without the two transforms. Matters at the unpaired Nyquist modes,
    which e.g. mean-flow advection rotates off the real axis.
    """

    def refl(a):
        a = jnp.flip(a, axis=(-2, -1))
        return jnp.roll(a, (1, 1), axis=(-2, -1))

    return C(0.5 * (zh.re + refl(zh.re)), 0.5 * (zh.im - refl(zh.im)))


def hermitian_project_half(zh: C, nx: int) -> C:
    """:func:`hermitian_project` expressed on the half-spectrum layout.

    Interior columns ``0 < k < nx/2`` are unconstrained — their dropped
    mirror columns are conjugate by construction. The self-mirror columns
    ``k = 0`` and ``k = nx/2`` pair rows ``l <-> -l`` *within* the column;
    that is the only place mean-flow advection can rotate unpaired modes
    off the Hermitian subspace, so projecting just those two columns
    reproduces what ``fft(real(ifft(.)))`` computes on the full spectrum.
    """
    re, im = zh.re, zh.im
    for c in (0, nx // 2):
        cre, cim = re[..., :, c], im[..., :, c]
        rre = jnp.roll(jnp.flip(cre, axis=-1), 1, axis=-1)
        rim = jnp.roll(jnp.flip(cim, axis=-1), 1, axis=-1)
        re = re.at[..., :, c].set(0.5 * (cre + rre))
        im = im.at[..., :, c].set(0.5 * (cim - rim))
    return C(re, im)


def _herm_reflect_conj(zh: C) -> C:
    """conj(Z(-k,-l)) on the full spectral grid."""

    def refl(a):
        a = jnp.flip(a, axis=(-2, -1))
        return jnp.roll(a, (1, 1), axis=(-2, -1))

    return C(refl(zh.re), -refl(zh.im))


def expand_half_to_full(zh: C) -> C:
    """Hermitian-expand a half-spectrum transform (..., ny, nx//2+1) of a
    real field to the full spectrum (..., ny, nx) via
    ``Z(l, k) = conj(Z(-l, -k))``. Exact (a gather, no arithmetic); only
    defined for even ``nx``. Inverse of :func:`project_full_to_half` on
    Hermitian inputs.
    """
    nk = zh.shape[-1]
    nh = nk - 1  # nx = 2*nh
    src_re = zh.re[..., 1:nh]
    src_im = zh.im[..., 1:nh]
    # column j of the tail is k = nk + j -> source column nx - k = nh-1-j
    # (flip), with the conjugate row reflection l -> (-l) % ny (flip+roll)
    tail_re = jnp.roll(jnp.flip(src_re, axis=(-2, -1)), 1, axis=-2)
    tail_im = -jnp.roll(jnp.flip(src_im, axis=(-2, -1)), 1, axis=-2)
    return C(jnp.concatenate([zh.re, tail_re], axis=-1),
             jnp.concatenate([zh.im, tail_im], axis=-1))


def project_full_to_half(zh: C) -> C:
    """First ``nx//2+1`` columns of the Hermitian projection of a
    full-spectrum transform — the half-spectrum array whose ``irfft2`` is
    exactly ``real(ifft2(zh))`` (the projection *is* what the reference's
    ``.real`` takes, see :func:`hermitian_project`)."""
    nk = zh.shape[-1] // 2 + 1
    zc = _herm_reflect_conj(zh)
    return C(0.5 * (zh.re + zc.re)[..., :nk],
             0.5 * (zh.im + zc.im)[..., :nk])


def zero_mean_mode(zh: C) -> C:
    """Zero the (0,0) spectral coefficient (``niwqg/Kernel.py:468,484``)."""
    return C(zh.re.at[..., 0, 0].set(0.0), zh.im.at[..., 0, 0].set(0.0))


def velocities(tr, grid, ph: C):
    """u = ifft(-il*ph).real, v = ifft(ik*ph).real (``niwqg/Kernel.py:481``)."""
    u = tr.ifft2_real(mul_i(ph, -grid.l))
    v = tr.ifft2_real(mul_i(ph, grid.k))
    return u, v


def jacobian_psi_q_hat(tr, grid, u, v, q, zero_mean: bool = True) -> C:
    """fft of J(psi, q) = ik*fft(u q) + il*fft(v q)."""
    jach = mul_i(tr.fft2_real(u * q), grid.k) + mul_i(tr.fft2_real(v * q), grid.l)
    if zero_mean:
        jach = zero_mean_mode(jach)
    return jach


def jacobian_psi_phi_hat(tr, u, v, phix: C, phiy: C, zero_mean: bool = True) -> C:
    """fft of u*phix + v*phiy for complex phi gradients."""
    jach = tr.fft2(phix * u + phiy * v)
    if zero_mean:
        jach = zero_mean_mode(jach)
    return jach


def gradients(tr, grid, zh: C):
    """(d/dx, d/dy) of a complex field from its transform."""
    zx = tr.ifft2(mul_i(zh, grid.k))
    zy = tr.ifft2(mul_i(zh, grid.l))
    return zx, zy


def wave_pv_hat(tr, grid, f: float, phi: C, phix: C, phiy: C,
                imag_jac: bool = False) -> C:
    """Wave potential vorticity qwh = 0.5*(0.5*gphi2h + J(phi*,phi)hat)/f.

    gphi2h = -wv2 * fft(|phi|^2); the Jacobian term is
    fft((1j*(conj(phix)*phiy - conj(phiy)*phix)).real) with the mean mode
    zeroed (``niwqg/CoupledModel.py:75-88``). The filter is applied by the
    caller to match the reference's ``qwh *= self.filtr``.

    ``imag_jac=True`` reproduces the reference QL transcription bug
    (``niwqg/QLModel.py:83``): the Jacobian term enters as ``1j*jach``
    (anti-Hermitian) instead of ``jach``.
    """
    gphi2h = tr.fft2_real(phi.abs2()) * (-grid.wv2)
    z = phix.conj() * phiy - phiy.conj() * phix
    jac_real = jmul(z).re  # (1j*z).real
    jach = zero_mean_mode(tr.fft2_real(jac_real))
    if imag_jac:
        jach = jmul(jach)
    return (0.5 * gphi2h + jach) * 0.5 / f


def cfl_number(u, v, phi_abs_max, dt: float, dx: float):
    """CFL from max(|u|,|v|,|phi|) (``niwqg/Kernel.py:660-662``)."""
    m = jnp.maximum(jnp.abs(u).max(), jnp.abs(v).max())
    m = jnp.maximum(m, phi_abs_max)
    return m * dt / dx
