"""User-facing model classes.

Thin stateful shells over the pure functional kernels, presenting the
reference's API surface (``Model(**kwargs)``, ``set_q``/``set_phi``/
``set_c``, ``run``, ``run_with_snapshots``, ``model.diagnostics[...]
['value']``) so a user of ``cesar-rocha/niwqg`` can switch with minimal
changes. Constructor kwargs and defaults follow ``niwqg/Kernel.py:70-98``
and ``niwqg/QGModel.py:65-91``; extra TPU-native knobs: ``dtype``,
``backend`` ('native' jnp.fft | 'mxu' matmul-DFT | 'auto'), ``precision``
(MXU precision mode), and ``mesh`` for sharded execution.
"""

from __future__ import annotations

import logging
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import diagnostics as diag_mod
from .carray import C
from .diagnostics import SeriesAccumulator
from .io import Saver
from .ops.fft import MXUTransform
from .models.coupled import CoupledPhysics
from .models.kernel import KernelParams, WaveKernel
from .models.qg import QGKernel, QGParams
from .models.ql import QLPhysics
from .models.uncoupled import UnCoupledPhysics
from .models.ybj import YBJKernel


def _default_dtype():
    # float64 where the backend will ACTUALLY compute it: on CPU that
    # additionally requires jax_enable_x64 — otherwise jnp silently
    # downcasts every array to f32 while the host-side tables (and the
    # host step counter in _count_steps) stay f64, silently diverging
    # from the reference f64 solver (review r5). float32 on TPU.
    if jax.default_backend() in ("cpu",) and jax.config.jax_enable_x64:
        return np.float64
    return np.float32


def _make_logger(name: str, loglevel: int = 10) -> logging.Logger:
    """Reference-style logger (``niwqg/Kernel.py:286-304``)."""
    logger = logging.getLogger(name)
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter("%(levelname)s: %(message)s"))
    if not logger.handlers:
        logger.addHandler(handler)
    logger.setLevel(loglevel)
    logger.propagate = False
    return logger


def _make_sharded_transform(nx, dtype, mesh, backend, precision, opts=None):
    """Distributed transform for a device mesh.

    CPU/GPU meshes get the shard_map pencil FFT; TPU-like backends get the
    MXU matmul-DFT, whose einsums GSPMD partitions into tensor-parallel
    matmuls with the right collectives. ``opts`` is the model's
    ``transform_opts`` dict: pencil meshes honor ``overlap_chunks``
    (pipelined transpose, see ``parallel/pfft.py``); MXU meshes forward
    everything to :class:`MXUTransform`.
    """
    opts = dict(opts or {})
    plat = jax.default_backend()
    if backend == "mxu" or (backend == "auto" and plat not in ("cpu", "gpu",
                                                               "cuda", "rocm")):
        # pencil-only options are ignored on the GSPMD MXU path
        opts.pop("overlap_chunks", None)
        opts.pop("pallas_a2a", None)
        opts.pop("pallas_interpret", None)
        return MXUTransform(nx, dtype, precision=precision, **opts)
    from .parallel.pfft import PencilTransform

    tr = PencilTransform(nx, dtype, mesh,
                         overlap_chunks=opts.pop("overlap_chunks", 1),
                         pallas_a2a=opts.pop("pallas_a2a", False),
                         pallas_interpret=opts.pop("pallas_interpret",
                                                   False))
    if opts:
        # MXU-only (or misspelled) keys: warn instead of silently
        # dropping — the MXU branch raises TypeError on unknowns, so a
        # typo should at least be visible here too (review r5)
        logging.getLogger(__name__).warning(
            "transform_opts ignored by the pencil provider: %s",
            sorted(opts))
    return tr


class _ModelBase:
    """Shared run-loop / IO / diagnostics machinery."""

    model = "model"

    def _init_services(self, path, save_to_disk, overwrite, registry,
                       snapshot_format="h5"):
        self.logger = _make_logger(type(self).__module__)
        self.logger.info(" %s", self.model)
        self.logger.info(
            " Using filter" if self.kernel.grid.use_filter else
            (" Dealiasing with 2/3 rule" if self.kernel.grid.dealias
             else " No dealiasing; no filter")
        )
        self.registry = registry
        self._diag_acc = SeriesAccumulator(registry)
        self.saver = Saver(path, save_to_disk, overwrite,
                           snapshot_format=snapshot_format)
        self.saver.save_setup(self)
        # large closed-over constants (ETDRK4 tables, wavenumber grids, DFT
        # matrices) are hoisted into jit arguments — embedding them as HLO
        # literals overflows the TPU remote-compile transport at 2048^2+
        self._step_h = None
        self._diag_h = None
        self._refresh_h = None
        self._status_h = None
        self._chunk_cache = {}
        # deferred set_q/set_phi/set_c queue (cold-build UX): device work
        # is flushed through ONE hoisted jitted module on the next state
        # read instead of dispatching each spectral op eagerly
        self._pending = []
        self._apply_cache = {}

    # -- lazy state initialization ----------------------------------------
    @property
    def state(self):
        if self.__dict__.get("_pending"):
            self._flush_pending()
        return self._state

    @state.setter
    def state(self, s):
        self._state = s

    def _queue_apply(self, name: str, value):
        """Defer ``kernel.apply_set_<name>`` until the state is next read.

        Eagerly, each set_* is ~10-30 op-by-op dispatches through the
        remote backend (every one a round-trip + op-compile) — measured
        1-2 min of model-build latency at 2048² (ROADMAP item 3 /
        VERDICT r4 item 5). Queued, the whole set sequence runs as one
        compiled module that also hits the persistent compile cache.
        Pass ``NIWQG_LAZY_INIT=0`` to restore eager dispatch (A/B knob).
        """
        import os

        if os.environ.get("NIWQG_LAZY_INIT", "1") == "0":
            self.state = self._shard(
                getattr(self.kernel, "apply_set_" + name)(self.state, value))
            return
        self._pending.append((name, value))

    def _flush_pending(self):
        ops, self._pending = self._pending, []
        names = tuple(n for n, _ in ops)
        vals = [v for _, v in ops]
        entry = self._apply_cache.get(names)
        if entry is None:
            from .utils.hoist import hoist

            K = self.kernel

            def apply_seq(s, *vs):
                for n, v in zip(names, vs):
                    s = getattr(K, "apply_set_" + n)(s, v)
                return s

            g, consts = hoist(apply_seq, self._state, *vals)
            entry = (jax.jit(g), consts)
            self._apply_cache[names] = entry
        jf, consts = entry
        self._state = self._shard(jf(consts, self._state, *vals))

    def _step_fns(self):
        if self._step_h is None:
            from .utils.hoist import hoist

            g, consts = hoist(self.kernel.step, self.state)
            self._step_h = (jax.jit(g), g, consts)
        return self._step_h

    def _step_jit(self, state):
        jit_g, _, consts = self._step_fns()
        return jit_g(consts, state)

    def _diag_jit(self, state, t_prev):
        jit_g, _, consts = self._diag_hoisted()
        return jit_g(consts, state, t_prev)

    # -- pure helpers ------------------------------------------------------
    def _diag_fn(self, state, t_prev):
        raise NotImplementedError

    def _chunk(self, n: int):
        if n not in self._chunk_cache:
            _, g, consts = self._step_fns()

            def chunk(consts_, s):
                return jax.lax.scan(lambda c, _: (g(consts_, c), None),
                                    s, None, length=n)[0]

            jit_chunk = jax.jit(chunk)
            self._chunk_cache[n] = lambda s: jit_chunk(consts, s)
        return self._chunk_cache[n]

    def _diag_hoisted(self):
        if self._diag_h is None:
            from .utils.hoist import hoist

            g, consts = hoist(self._diag_fn, self.state, self.state.t)
            self._diag_h = (jax.jit(g), g, consts)
        return self._diag_h

    @property
    def _stale_grads(self) -> bool:
        """True in the UnCoupled ``faithful_quirks`` mode: phi gradients
        must be refreshed on the reference's diagnostics/print cadence."""
        physics = getattr(self.kernel, "physics", None)
        return bool(getattr(physics, "stale_phi_gradients", False))

    def _refresh_fns(self):
        if self._refresh_h is None:
            from .utils.hoist import hoist

            g, consts = hoist(self.kernel.refresh_phi_gradients, self.state)
            self._refresh_h = (jax.jit(g), g, consts)
        return self._refresh_h

    def _refresh_jit(self, state):
        jit_g, _, consts = self._refresh_fns()
        return jit_g(consts, state)

    def _status_scalars(self, make_fn):
        """Status-line scalars via ONE hoisted jitted module + a single
        ``device_get`` — evaluating them eagerly is ~15-30 op-by-op
        dispatches through the remote backend per ``twrite``, which
        dominated run()'s per-cadence-gap overhead (run_warmup_r4.log:
        0.62 -> 0.49 s/gap at 2048^2, twrite=10)."""
        if self._status_h is None:
            from .utils.hoist import hoist

            g, consts = hoist(make_fn, self.state)
            jf = jax.jit(g)
            self._status_h = lambda s: jf(consts, s)
        return tuple(float(v) for v in
                     jax.device_get(self._status_h(self.state)))

    def _chunk_with_diags(self, n: int):
        """Compiled ``lax.scan`` of ``n`` steps with the diagnostics cadence
        fused in: iterations whose *pre-step* counter hits ``tdiags``
        (``niwqg/Diagnostics.py:41-43`` semantics) evaluate the registry
        inside the scan via ``lax.cond``, so the host sees one dispatch per
        chunk instead of one per step."""
        key = ("diag", n)
        if key not in self._chunk_cache:
            _, g, consts = self._step_fns()
            _, gd, dconsts = self._diag_hoisted()
            tdiags = int(self.params.tdiags)
            stale = self._stale_grads
            if stale:
                _, gr, rconsts = self._refresh_fns()
            else:
                gr, rconsts = None, ()

            def chunk(consts_, dconsts_, rconsts_, s0):
                def body(s, _):
                    t_prev, tc_prev = s.t, s.tc
                    s2 = g(consts_, s)
                    sampled = (tc_prev % tdiags) == 0
                    spec = jax.eval_shape(gd, dconsts_, s2, t_prev)
                    vals = jax.lax.cond(
                        sampled,
                        lambda: gd(dconsts_, s2, t_prev),
                        lambda: jax.tree.map(
                            lambda sd: jnp.zeros(sd.shape, sd.dtype), spec),
                    )
                    if stale:
                        # gradient refresh rides the diagnostics cadence
                        # (after evaluation — reference lambda order)
                        s2 = jax.lax.cond(
                            sampled, lambda: gr(rconsts_, s2), lambda: s2)
                    return s2, vals
                return jax.lax.scan(body, s0, None, length=n)

            jit_chunk = jax.jit(chunk)
            self._chunk_cache[key] = (
                lambda s: jit_chunk(consts, dconsts, rconsts, s))
        return self._chunk_cache[key]

    def _count_steps(self, tmax: float) -> int:
        """Steps the reference's ``while t < tmax`` loop would take from the
        current state, replicating the device's dtype-accurate ``t += dt``
        accumulation so chunked and per-step runs stop identically."""
        dtype = self.kernel.dtype
        t = np.asarray(self.state.t, dtype=dtype)
        dt = np.asarray(self.params.dt, dtype=dtype)
        n = 0
        while float(t) < tmax:
            t = (t + dt).astype(dtype)
            n += 1
        return n

    # -- grid passthroughs (reference attribute surface) -------------------
    @property
    def grid(self):
        return self.kernel.grid

    @property
    def nx(self):
        return self.kernel.grid.nx

    @property
    def ny(self):
        return self.kernel.grid.ny

    @property
    def L(self):
        return self.kernel.grid.L

    @property
    def x(self):
        return self.kernel.grid.x_np

    @property
    def y(self):
        return self.kernel.grid.y_np

    @property
    def wv(self):
        return self.kernel.grid.wv_np

    @property
    def wv2(self):
        return self.kernel.grid.wv2_np

    @property
    def kk(self):
        return self.kernel.grid.kk_np

    @property
    def ll(self):
        return self.kernel.grid.ll_np

    @property
    def filtr(self):
        return self.kernel.grid.filtr_np

    @property
    def dt(self):
        return self.kernel.params.dt

    @property
    def t(self):
        return float(np.asarray(self.state.t))

    @property
    def tc(self):
        return int(np.asarray(self.state.tc))

    @property
    def wv4(self):
        return self.kernel.grid.wv4_np

    @property
    def wv2i(self):
        return self.kernel.grid.wv2i_np

    @property
    def dx(self):
        return self.kernel.grid.dx

    def __getattr__(self, name):
        # physics-parameter passthrough (m.nu4, m.f, m.beta, ...) for
        # reference-style user scripts
        params = self.__dict__.get("params")
        if params is not None and hasattr(params, name):
            return getattr(params, name)
        raise AttributeError(
            f"{type(self).__name__!r} object has no attribute {name!r}"
        )

    def fft(self, x):
        """Host-side transform matching the model layout (user scripts)."""
        g = self.kernel.grid
        if g.spectrum == "half":
            xh = np.fft.rfft2(x)
            if g.pad:
                xh = np.pad(xh, [(0, 0)] * (xh.ndim - 1) + [(0, g.pad)])
            return xh
        return np.fft.fft2(x)

    def ifft(self, xh):
        g = self.kernel.grid
        if g.spectrum == "half":
            return np.fft.irfft2(xh[..., : self.nx // 2 + 1],
                                 s=(self.ny, self.nx))
        return np.fft.ifft2(xh)

    @property
    def diagnostics(self):
        return self._diag_acc.as_reference_dict()

    def describe_diagnostics(self):
        print(self.registry.describe())

    def get_diagnostic(self, dname: str):
        """Accumulated series for one diagnostic
        (``niwqg/Diagnostics.py:6-8``, minus its never-incremented
        ``count`` division bug)."""
        return np.hstack([np.asarray(v) for v in
                          self._diag_acc.series[dname]])

    def set_active_diagnostics(self, names):
        """Restrict which diagnostics are evaluated/accumulated."""
        self.registry.set_active(names)
        self._diag_h = None  # re-trace with the new active set
        # drop fused-diagnostic chunks compiled against the old active set
        self._chunk_cache = {k: v for k, v in self._chunk_cache.items()
                             if not (isinstance(k, tuple) and k[0] == "diag")}

    def spec_var(self, ph):
        """Host-side spec_var on a numpy complex transform array."""
        g = self.kernel.grid
        var_dens = np.abs(np.asarray(ph)) ** 2 / float(g.M) ** 2
        if g.spectrum == "half":
            var_dens = 2.0 * var_dens
            var_dens[:, 0] *= 0.5
            var_dens[:, g.nx // 2] *= 0.5  # Nyquist (layout may be padded)
        var_dens[0, 0] = 0.0
        return var_dens.sum()

    # -- run loop ----------------------------------------------------------
    def _snapshot_fields(self):
        raise NotImplementedError

    def _step_forward(self):
        """One step + diagnostics/print/save cadence
        (``niwqg/Kernel.py:205-217``; cadence quirks per SURVEY.md §2)."""
        p = self.params
        tc_before = int(np.asarray(self.state.tc))
        t_prev = self.state.t
        self.state = self._step_jit(self.state)

        # diagnostics sampled when the *pre-step* counter hits the cadence
        # (``niwqg/Diagnostics.py:41-43`` runs before ``_print_status``
        # increments tc), recording the pre-step time.
        if tc_before % p.tdiags == 0:
            vals = self._diag_jit(self.state, t_prev)
            self._diag_acc.append(jax.device_get(vals))
            if self._stale_grads:
                # the reference's pe_niw diagnostic refreshes phix/phiy as
                # a side effect (``niwqg/Kernel.py:608-611``), AFTER the
                # conversion terms were evaluated with the stale ones
                self.state = self._refresh_jit(self.state)

        tc_now = tc_before + 1
        if tc_now % p.twrite == 0:
            self._print_status()
            if self._stale_grads:
                # _print_status calls _calc_pe_niw (``Kernel.py:592``)
                self.state = self._refresh_jit(self.state)
        if tc_now % p.tsave_snapshots == 0:
            self.saver.save_snapshot(self, self._snapshot_fields())

    def _host_event_stride(self, extra_stride=None):
        """Smallest cadence requiring host action between compiled chunks:
        prints every ``twrite`` steps, snapshots every ``tsave_snapshots``
        (only when saving to disk), plus any caller stride. Diagnostics do
        NOT count — they are fused into the chunk."""
        p = self.params
        strides = [int(p.twrite)]
        if self.saver.save_to_disk:
            strides.append(int(p.tsave_snapshots))
        if extra_stride:
            strides.append(int(extra_stride))
        return strides

    def _advance_chunked(self, nsteps: int, extra_stride=None):
        """Advance ``nsteps`` steps in compiled chunks that break exactly at
        host-event boundaries (print/snapshot cadences), accumulating the
        cadenced diagnostics sampled inside the scans. Yields the post-step
        counter at every boundary so callers can interleave host actions."""
        p = self.params
        strides = self._host_event_stride(extra_stride)
        done = 0
        while done < nsteps:
            tc0 = self.tc
            n = nsteps - done
            for m in strides:
                # next post-step multiple of m strictly after tc0
                n = min(n, (tc0 // m + 1) * m - tc0)
            # decompose the gap into power-of-two pieces: every distinct
            # scan length is a separate XLA module (30-100 s compile on
            # the target backend), so arbitrary gap lengths would compile
            # per cadence layout; power-of-two pieces bound the compiled
            # set to ~log2(gap) sizes reused across all gaps. Diagnostics
            # sampling is pre-step-counter-based inside the scan, so
            # piece boundaries cannot change its semantics.
            # (Measured negative, round 4: running small gaps as ONE
            # exact-length piece — halving dispatches per gap — tied the
            # piecewise decomposition exactly (0.61 vs 0.62 s per
            # 10-step gap at 2048², run_warmup_r4.log): the per-gap cost
            # is the diagnostics device_get + host sync, not dispatch
            # count. Keep the simpler invariant rule.)
            off = 0
            while off < n:
                piece = 1 << ((n - off).bit_length() - 1)
                state, dvals = self._chunk_with_diags(piece)(self.state)
                self.state = state
                dvals = jax.device_get(dvals)
                for i in range(piece):
                    if (tc0 + off + i) % p.tdiags == 0:
                        self._diag_acc.append(
                            {k: v[i] for k, v in dvals.items()})
                off += piece
            done += n
            tc_now = tc0 + n
            if tc_now % p.twrite == 0:
                self._print_status()
                if self._stale_grads:
                    # _print_status calls _calc_pe_niw (``Kernel.py:592``)
                    self.state = self._refresh_jit(self.state)
            if self.saver.save_to_disk and tc_now % p.tsave_snapshots == 0:
                self.saver.save_snapshot(self, self._snapshot_fields())
            yield tc_now

    def run(self):
        """Run to ``tmax`` (``niwqg/Kernel.py:183-203``).

        Steps are executed as fused ``lax.scan`` chunks spanning the gaps
        between host-visible cadence points (the per-step dispatch of the
        naive loop costs ~1000x the step itself on the remote TPU backend,
        ``bench.py`` notes); diagnostics/print/snapshot semantics are
        identical to the reference's per-step loop (asserted by
        ``tests/test_chunked_run.py``)."""
        if self.saver.save_to_disk:
            self.saver.save_snapshot(self, self._snapshot_fields())
        for _ in self._advance_chunked(self._count_steps(self.params.tmax)):
            pass
        if self.saver.save_to_disk:
            self.saver.save_diagnostics(self.diagnostics)

    def run_with_snapshots(self, tsnapstart=0.0, tsnapint=432000.0):
        """Generator run loop (``niwqg/Kernel.py:161-181``): yields at every
        ``tsnapint`` once past ``tsnapstart`` so user code can inspect the
        live model, with compiled chunks in between."""
        tsnapints = int(np.ceil(tsnapint / self.params.dt))
        total = self._count_steps(self.params.tmax)
        try:
            for tc_now in self._advance_chunked(total,
                                                extra_stride=tsnapints):
                if self.t >= tsnapstart and (tc_now % tsnapints) == 0:
                    yield self.t
        finally:
            # flush (and surface errors from) any queued async snapshot
            # writes — this loop never reaches save_diagnostics' drain
            self.saver.drain()

    def run_steps(self, n: int):
        """Fast path: n steps as one compiled ``lax.scan`` (no host I/O)."""
        self.state = self._chunk(n)(self.state)
        return self.state

    def _print_status(self):
        raise NotImplementedError

    def isotropic_spectrum(self, field):
        """pyspec-style power spectrum of a model field: 2-D PSD plus its
        azimuthal ring integral (what the reference examples import the
        external ``pyspec`` package for, ``examples/LambDipole.py:159-171``).

        ``field`` is a physical-space array or the name of a model
        attribute (e.g. ``'q'``, ``'phi'``, ``'p'``). Returns a
        :class:`~niwqg_tpu.utils.spectrum.TwoDimensionalSpec`.
        """
        from .utils.spectrum import spectrum_2d

        if isinstance(field, str):
            field = getattr(self, field)
        dx = self.kernel.grid.dx
        return spectrum_2d(np.asarray(field), dx, dx)

    # checkpointing (beyond-reference capability)
    def save_checkpoint(self, path: str):
        from .io import save_checkpoint

        save_checkpoint(path, self)

    def load_checkpoint(self, path: str):
        from .io import load_checkpoint

        load_checkpoint(path, self)
        # re-apply the model's mesh shardings: the checkpoint reader
        # builds host-placed (unsharded) arrays, and a mesh model must
        # not carry them into the compiled step (silent relayout at
        # best, a replicated step at worst — VERDICT r4 weakness 1)
        self.state = self._shard(self.state)
        return self


class _WaveModel(_ModelBase):
    """Common shell for the four wave-kernel models."""

    _physics_factory = None
    _registry_factory = staticmethod(diag_mod.wave_kernel_registry)
    _kernel_cls = WaveKernel

    def __init__(self, nx=128, ny=None, L=5e5, dt=10000.0, twrite=1000,
                 tmax=250000.0, use_filter=True, cflmax=0.8, U=0.0, f=1.0e-4,
                 N=0.01, m=0.025, g=9.81, nu4=0, nu4w=0, nu=20, nuw=50.0,
                 mu=0, muw=0, dealias=False, save_to_disk=False,
                 overwrite=True, tsave_snapshots=10, tdiags=10,
                 path="output/", dtype=None, backend="auto",
                 precision="auto", mesh=None, fast=None,
                 snapshot_format="h5", compute_budgets=True,
                 spectral_budgets=True, **kernel_kwargs):
        del ny  # accepted but ignored, as in the reference (Kernel.py:101)
        if fast is None:
            # batched fast kernel by default on TPU-like backends
            fast = (backend == "mxu" or
                    (backend == "auto" and
                     jax.default_backend() not in ("cpu", "gpu", "cuda",
                                                   "rocm")))
        self._fast = bool(fast)
        self.params = KernelParams(
            nx=nx, L=L, dt=dt, tmax=tmax, twrite=int(twrite), cflmax=cflmax,
            U=U, f=f, N=N, m=m, g=g, nu4=nu4, nu4w=nu4w, nu=nu, nuw=nuw,
            mu=mu, muw=muw, use_filter=use_filter, dealias=dealias,
            tdiags=tdiags, tsave_snapshots=tsave_snapshots,
            compute_budgets=compute_budgets,
            spectral_budgets=spectral_budgets,
        )
        dtype = dtype or _default_dtype()
        self._mesh = mesh
        if mesh is not None:
            kernel_kwargs["transform"] = _make_sharded_transform(
                nx, dtype, mesh, backend, precision,
                opts=kernel_kwargs.pop("transform_opts", None),
            )
        self.kernel = self._make_kernel(dtype, backend, precision,
                                        **kernel_kwargs)
        self.state = self._shard(self.kernel.zero_state())
        self._init_services(path, save_to_disk, overwrite,
                            self._registry_factory(),
                            snapshot_format=snapshot_format)

    def _make_kernel(self, dtype, backend, precision, **kw):
        cls = self._kernel_cls
        if kw.get("pair_inverse") and not getattr(self, "_fast", False):
            raise ValueError(
                "pair_inverse requires the batched fast kernel — pass "
                "fast=True (the default on TPU backends)")
        if getattr(self, "_fast", False) and cls is WaveKernel:
            from .models.fast_kernel import FastWaveKernel

            cls = FastWaveKernel
            if self._mesh is not None:
                from .parallel.pfft import PencilTransform

                if isinstance(kw.get("transform"), PencilTransform):
                    # the pencil rfft pads spectral columns to a
                    # mesh-divisible count, which the fast kernel's
                    # unpadded q_half tables don't model — the shard_map
                    # path keeps the full-spectrum q side
                    kw.setdefault("q_half", False)
                # the GSPMD MXU path keeps q_half: the half-spectrum
                # width nx//2+1 is never mesh-divisible, so those arrays
                # are ROW-sharded instead (shard_wave_state) and the
                # matmul-DFT partitions from there
        return cls(self.params, self._physics_factory(),
                   dtype=dtype, backend=backend, precision=precision, **kw)

    def _shard(self, state):
        if self._mesh is None:
            return state
        from .parallel.mesh import shard_wave_state

        return shard_wave_state(state, self._mesh)

    # -- state access ------------------------------------------------------
    @property
    def q(self):
        return np.asarray(self.state.d.q)

    @property
    def phi(self):
        return self.state.d.phi.to_complex()

    @property
    def p(self):
        if self.state.d.p is None:
            # spectral-budget states don't carry the physical
            # streamfunction; reconstruct from ph on access
            return np.asarray(self.kernel._inv_real(self.state.d.ph))
        return np.asarray(self.state.d.p)

    def _q_side_full(self, zh):
        """q-side spectra as the reference's full-spectrum layout (the
        fast kernel's ``q_half`` mode stores the rfft half-spectrum)."""
        if getattr(self.kernel, "q_half", False):
            from .ops.spectral import expand_half_to_full

            zh = expand_half_to_full(zh)
        return zh.to_complex()

    @property
    def qh(self):
        return self._q_side_full(self.state.qh)

    @property
    def phih(self):
        return self.state.phih.to_complex()

    @property
    def ph(self):
        return self._q_side_full(self.state.d.ph)

    @property
    def u(self):
        return np.asarray(self.state.d.u)

    @property
    def v(self):
        return np.asarray(self.state.d.v)

    @property
    def q_psi(self):
        return np.asarray(self.state.d.q_psi)

    @property
    def qwh(self):
        return self._q_side_full(self.state.d.qwh)

    @property
    def Ke(self):
        return float(np.asarray(self.state.Ke))

    @property
    def Pw(self):
        return float(np.asarray(self.state.Pw))

    @property
    def Kw(self):
        return float(np.asarray(self.state.Kw))

    def get_field(self, name: str):
        if name == "t":
            return self.t
        return getattr(self, name)

    def _snapshot_fields(self):
        return ["t", "q", "phi"]

    def set_q(self, q):
        # copy: the queue must capture the VALUE at call time (asarray
        # aliases a matching-dtype input, and the caller may mutate it
        # before the lazy flush)
        self._queue_apply("q", np.array(q, dtype=self.kernel.dtype))

    def set_phi(self, phi):
        if not isinstance(phi, C):
            phi = C.from_complex(np.asarray(phi), dtype=self.kernel.dtype)
        else:
            phi = phi.astype(self.kernel.dtype)
        self._queue_apply("phi", phi)

    def _diag_fn(self, state, t_prev):
        K = self.kernel
        src = K.stage_sources(state.qh, state.phih, state.d)
        if self._stale_grads:
            # reference diagnostic-lambda order (``Kernel.py:718-868``):
            # pe_niw refreshes phix/phiy mid-iteration, so the ep_phi and
            # chi_phi lambdas (registered later, and recomputing rather
            # than reading stored values) see FRESH gradients while
            # gamma/xi read the conversion terms computed with stale ones
            d2 = K.refresh_phi_gradients(state).d
            fresh = K.stage_sources(state.qh, state.phih, d2)
            src = src._replace(ep_phi=fresh.ep_phi, chi_phi=fresh.chi_phi)
        aux = {"time": t_prev, "src": src}
        return self.registry.evaluate(K, state, aux)

    def _print_status(self):
        """``niwqg/Kernel.py:568-598`` status line + CFL guard."""
        K = self.kernel
        ke, kew, pew, cfl = self._status_scalars(
            lambda s: (K.ke_qg(s.d.ph), K.ke_niw(s.d.phi),
                       K.pe_niw(s.phih), K.cfl(s)))
        self.logger.info(
            "Step: %4i, Time: %2.1e, P: %2.1e, Ke: %4.3e, Kw: %4.3e, "
            "Pw: %4.3e, CFL: %3.2f",
            self.tc, self.t, self.t / self.params.tmax, ke, kew, pew, cfl,
        )
        # explicit raise, not `assert`: the guard must survive python -O
        # (reference semantics: AssertionError, ``niwqg/Kernel.py:598``)
        if not (cfl < self.params.cflmax):
            self.logger.error("CFL condition violated")
            raise AssertionError(f"CFL condition violated: {cfl:.3f} >= "
                                 f"{self.params.cflmax}")


class CoupledModel(_WaveModel):
    """Xie & Vanneste (2015) coupled model (``niwqg/CoupledModel.py``)."""

    model = " Coupled Model"
    _physics_factory = staticmethod(CoupledPhysics)
    _registry_factory = staticmethod(diag_mod.coupled_registry)

    def _diag_fn(self, state, t_prev):
        K = self.kernel
        src = K.stage_sources(state.qh, state.phih, state.d)
        q_, w_, qw_ = K.physics.ke_qg_decomp(K, state.qh, state.d.qwh)
        aux = {"time": t_prev, "src": src, "ke_qg_q": q_, "ke_qg_w": w_,
               "ke_qg_qw": qw_}
        return self.registry.evaluate(K, state, aux)


class UnCoupledModel(_WaveModel):
    """YBJ waves on an evolving flow (``niwqg/UnCoupledModel.py``).

    Default-behavior policy (uniform across models): **the default
    reproduces the reference as it actually runs** — a ported reference
    script gets the reference trajectory. ``faithful_quirks=True``
    (default) reproduces the reference's stale-gradient cadence
    bug-for-bug (golden parity, ``tests/test_golden_reference.py``);
    pass ``faithful_quirks=False`` to recompute the wave gradients every
    stage (the intended physics — see ``models/uncoupled.py``)."""

    model = " Uncoupled Model"
    _physics_factory = staticmethod(UnCoupledPhysics)

    def __init__(self, *args, faithful_quirks: Optional[bool] = None,
                 **kwargs):
        defaulted = faithful_quirks is None
        if defaulted:
            faithful_quirks = True  # parity-by-default (flipped in r4)
        if faithful_quirks:
            self._physics_factory = (
                lambda: UnCoupledPhysics(faithful_quirks=True))
        super().__init__(*args, **kwargs)
        if defaulted:
            # the default changed False->True in round 4 (parity-by-default
            # policy); surface it once so users who relied on the earlier
            # corrected-physics default notice (ADVICE r4)
            self.logger.info(
                " faithful_quirks defaulting to True (reference-parity "
                "stale-gradient cadence); pass faithful_quirks=False for "
                "the corrected per-stage gradients")


class QLModel(_WaveModel):
    """Quasilinear coupled model (intended physics of ``niwqg/QLModel.py``).

    Default-behavior policy: defaults elsewhere reproduce the reference
    as it runs, but the reference QLModel cannot run as shipped (it
    crashes at construction, ``niwqg/Kernel.py:140``), so there is no
    as-shipped trajectory to be faithful to — the default here is the
    *intended* quasilinear physics. ``faithful_quirks=True`` reproduces
    the *repaired* reference QL
    bug-for-bug (see ``models/ql.py``): the ``1j`` wave-PV factor
    (``QLModel.py:83``), unprojected ``ph`` (``QLModel.py:86``), and the
    never-updated ``self.q`` — whose user-visible faces are a frozen
    ``m.q`` attribute and a frozen ``ens`` diagnostic (both read the
    initial vorticity, since ``QL._invert`` never refreshes ``self.q``)."""

    model = " Quasilinear Model"
    _physics_factory = staticmethod(QLPhysics)

    def __init__(self, *args, faithful_quirks: bool = False, **kwargs):
        self._faithful = bool(faithful_quirks)
        if faithful_quirks:
            self._physics_factory = (
                lambda: QLPhysics(faithful_quirks=True))
            # the reference's _calc_ens reads the frozen self.q
            # (``niwqg/Kernel.py:625-627``), which in this mode is exactly
            # the carried q_psi
            reg = diag_mod.wave_kernel_registry()
            reg.add("ens", "Quasigeostrophic Potential Enstrophy", r"s^{-2}",
                    function=lambda K, s, aux: K.ens(s.d.q_psi))
            self._registry_factory = lambda: reg
        super().__init__(*args, **kwargs)

    @property
    def q(self):
        if self._faithful:
            # reference ``self.q`` is never updated after set_q
            return np.asarray(self.state.d.q_psi)
        return np.asarray(self.state.d.q)


class YBJModel(_WaveModel):
    """Waves on a steady flow (``niwqg/YBJModel.py``)."""

    model = " YBJ Model (Steady QG flow)"

    def _make_kernel(self, dtype, backend, precision, faithful_quirks=True,
                     transform=None, transform_opts=None, fold_filter=False):
        return YBJKernel(self.params, faithful_quirks=faithful_quirks,
                         dtype=dtype, backend=backend, precision=precision,
                         transform=transform, transform_opts=transform_opts,
                         fold_filter=fold_filter)


class QGModel(_ModelBase):
    """Standalone barotropic QG model (``niwqg/QGModel.py``)."""

    model = " QG Model"

    def __init__(self, nx=128, ny=None, L=5e5, dt=10000.0, twrite=1000,
                 tswrite=10, tmax=250000.0, use_filter=True, U=0.0,
                 nu4=5.0e9, nu=0, mu=0, beta=0, passive_scalar=False,
                 nu4c=5.0e9, nuc=0, muc=0, dealias=False, save_to_disk=False,
                 overwrite=True, tsave_snapshots=10, tdiags=10,
                 path="output/", dtype=None, backend="auto",
                 precision="auto", mesh=None, transform_opts=None,
                 spectral_budgets=True, fold_filter=False):
        del ny, tswrite
        self.params = QGParams(
            nx=nx, L=L, dt=dt, tmax=tmax, twrite=int(twrite), cflmax=0.5,
            U=U, beta=beta, nu4=nu4, nu=nu, mu=mu,
            passive_scalar=passive_scalar, nu4c=nu4c, nuc=nuc, muc=muc,
            use_filter=use_filter, dealias=dealias, tdiags=tdiags,
            tsave_snapshots=tsave_snapshots,
            spectral_budgets=spectral_budgets,
        )
        dtype = dtype or _default_dtype()
        self._mesh = mesh
        kw = {"transform_opts": transform_opts}
        if mesh is not None:
            # distributed transforms keep the reference's half-spectrum
            # layout (pencil rfft pads columns to a mesh-divisible count)
            kw["transform"] = _make_sharded_transform(nx, dtype, mesh,
                                                      backend, precision,
                                                      opts=kw.pop(
                                                          "transform_opts"))
        self.kernel = QGKernel(self.params, dtype=dtype, backend=backend,
                               precision=precision, fold_filter=fold_filter,
                               **kw)
        self.state = self._shard(self.kernel.zero_state())
        self._init_services(path, save_to_disk, overwrite,
                            diag_mod.qg_registry())

    def _shard(self, state):
        if self._mesh is None:
            return state
        from .parallel.mesh import shard_qg_state

        return shard_qg_state(state, self._mesh)

    # -- state access ------------------------------------------------------
    @property
    def q(self):
        return np.asarray(self.state.q)

    @property
    def c(self):
        return np.asarray(self.state.c)

    @property
    def p(self):
        return np.asarray(self.state.p)

    @property
    def qh(self):
        return self.state.qh.to_complex()

    @property
    def ch(self):
        return self.state.ch.to_complex()

    @property
    def ph(self):
        return self.state.ph.to_complex()

    @property
    def Ke(self):
        return float(np.asarray(self.state.Ke))

    @property
    def cvar(self):
        return float(np.asarray(self.state.cvar))

    def get_field(self, name: str):
        if name == "t":
            return self.t
        return getattr(self, name)

    def _snapshot_fields(self):
        # the reference's _step_forward always requests ['t','q','c']
        # (``niwqg/QGModel.py:221``)
        return ["t", "q", "c"] if self.params.passive_scalar else ["t", "q"]

    def set_q(self, q):
        # copy, not asarray: capture the value at call time (see _WaveModel)
        self._queue_apply("q", np.array(q, dtype=self.kernel.dtype))

    def set_c(self, c):
        self._queue_apply(
            "c", np.real(np.asarray(c)).astype(self.kernel.dtype))

    def _diag_fn(self, state, t_prev):
        K = self.kernel
        aux = {"time": t_prev}
        if self.params.passive_scalar:
            C2, gradC2, lapc, Gamma_c = K._scalar_derived(state.ch, state.u,
                                                          state.v, state.c)
            aux.update(
                C2=C2, gradC2=gradC2, Gamma_c=Gamma_c,
                ep_c=K.ep_c(C2, gradC2, lapc),
                chi_c=K.chi_c(state.ch, gradC2, lapc),
            )
        else:
            zero = state.Ke * 0.0
            aux.update(C2=zero, gradC2=zero, Gamma_c=zero, ep_c=zero,
                       chi_c=zero)
        return self.registry.evaluate(K, state, aux)

    def _print_status(self):
        """``niwqg/QGModel.py:554-578``."""
        K = self.kernel
        ke, cfl = self._status_scalars(lambda s: (K.ke_qg(s.ph), K.cfl(s)))
        self.logger.info(
            "Step: %i, Time: %4.3e, P: %4.3e , Ke: %4.3e, CFL: %4.3f",
            self.tc, self.t, self.t / self.params.tmax, ke, cfl,
        )
        if not (cfl < self.params.cflmax):  # survives python -O
            self.logger.error("CFL condition violated")
            raise AssertionError(f"CFL condition violated: {cfl:.3f} >= "
                                 f"{self.params.cflmax}")
