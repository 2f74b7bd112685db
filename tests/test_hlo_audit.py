"""Structural audit of the sharded step's compiled collectives.

Value-equality sharding tests (``test_sharding.py``) cannot catch a GSPMD
regression that silently inserts a full-field all-gather: the numbers stay
right while multi-chip performance collapses. This audit compiles the
sharded coupled/QG step on the virtual mesh and asserts the collective
*structure* of the HLO:

  - the shard_map pencil path is hand-designed (``parallel/pfft.py``): its
    only collectives must be the transpose ``all-to-all``s and scalar
    ``all-reduce``s (domain means). Any ``all-gather``/``collective-permute``
    means the partitioner took over a path it should never see.
  - the GSPMD MXU path lets the partitioner choose; there the invariant is
    a *traffic budget*: no single all-gather may materialize more than a
    few fields, and the total gathered volume per step stays within 2x of
    the audited snapshot (a full-state gather would blow through it).

The reference has no distributed execution (SURVEY.md §2); this guards the
scale-out layer that replaces it.
"""

import re
from collections import Counter

import numpy as np
import pytest

import jax

from niwqg_tpu import CoupledModel, QGModel
from niwqg_tpu import InitialConditions as ic
from niwqg_tpu.parallel.mesh import make_mesh

NDEV = 4
NX = 128


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < NDEV:
        pytest.skip("needs >= 4 devices")
    return make_mesh(NDEV)


def _step_hlo_coupled(mesh, **kw):
    U0 = 0.05
    m = CoupledModel.Model(use_filter=False, U=-U0, tdiags=1,
                           tmax=3 * 10000.0, mesh=mesh, **kw)
    k0 = 10 * (2 * np.pi / m.L)
    m.set_q(ic.LambDipole(m, U=U0, R=2 * np.pi / k0))
    m.set_phi((np.ones((m.nx, m.nx)) + 1j) * 2 * U0 / np.sqrt(2))
    _, g, consts = m._step_fns()
    return jax.jit(g).lower(consts, m.state).compile().as_text()


def _step_hlo_qg(mesh, **kw):
    U0 = 0.05
    m = QGModel.Model(use_filter=False, U=-U0, tdiags=1,
                      tmax=3 * 10000.0, mesh=mesh, **kw)
    k0 = 10 * (2 * np.pi / m.L)
    m.set_q(ic.LambDipole(m, U=U0, R=2 * np.pi / k0))
    _, g, consts = m._step_fns()
    return jax.jit(g).lower(consts, m.state).compile().as_text()


def _op_count(txt, op):
    return len(re.findall(re.escape(op + "("), txt))


def _result_shapes(txt, op):
    """Result shapes (as element counts) of every ``op`` in the HLO.

    Handles both plain results (``= f64[4,128]{1,0} op(...)``) and the
    variadic tuple form XLA's combiners emit, incl. its ``/*index=N*/``
    comments (``= (f64[], /*index=1*/f64[]) all-reduce(...)``); parsed
    line-by-line because the tuple type can be arbitrarily long.
    """
    out = []
    marker = " " + op + "("
    for line in txt.splitlines():
        if marker not in line or "= " not in line:
            continue
        restype = line.split("= ", 1)[1].split(marker, 1)[0]
        for dims in re.findall(r"\w+\[([0-9,]*)\]", restype):
            out.append(int(np.prod(
                [int(d) for d in dims.split(",") if d] or [1])))
    return out


def _assert_pencil_invariants(txt, label):
    assert _op_count(txt, "all-to-all") > 0, f"{label}: transposes vanished"
    assert _op_count(txt, "all-gather") == 0, (
        f"{label}: GSPMD inserted an all-gather into the hand-sharded "
        f"pencil step")
    assert _op_count(txt, "collective-permute") == 0, label
    # domain-mean reductions only: every all-reduce result must be scalar
    ar = _result_shapes(txt, "all-reduce")
    assert ar, f"{label}: psum reductions vanished"
    assert max(ar) == 1, (
        f"{label}: non-scalar all-reduce (sizes {sorted(set(ar))}) — a "
        f"field-sized reduction means replicated recompute snuck in")


def test_pencil_coupled_step_collectives(mesh):
    _assert_pencil_invariants(_step_hlo_coupled(mesh), "coupled/pencil")


def test_pencil_qg_step_collectives(mesh):
    _assert_pencil_invariants(_step_hlo_qg(mesh), "qg/pencil")


def test_pencil_pair_inverse_batches_one_collective(mesh):
    """pair_inverse halves the real-inverse group's transpose VOLUME
    (the pinned invariant below: >= 10% fewer all-to-all elements). The
    op COUNT matches the unpacked step by design — the fast kernel
    already batches each transform group into one collective; the
    round-5 batched packing (ADVICE r4) keeps it that way rather than
    regressing to one collective per pair (guarded by the <=)."""
    base = _step_hlo_coupled(mesh, fast=True)
    pair = _step_hlo_coupled(mesh, fast=True, pair_inverse=True)
    # the fast kernel already batches each transform group into one
    # all_to_all op, so the op COUNT matches; the win is VOLUME — the
    # packed inverse moves half the real-inverse group's elements
    # (52 -> 44 transposed fields/step, traffic_audit_r4)
    n_base = _op_count(base, "all-to-all")
    n_pair = _op_count(pair, "all-to-all")
    assert n_pair <= n_base, (n_pair, n_base)
    v_base = sum(_result_shapes(base, "all-to-all"))
    v_pair = sum(_result_shapes(pair, "all-to-all"))
    # audited: 212992 -> 180224 elements at nx=128/4 dev (-15.4%, the
    # traffic_audit_r4 figure)
    assert v_pair <= 0.90 * v_base, (
        f"pair_inverse no longer reduces transpose volume: "
        f"{v_pair} vs {v_base} elements")
    # the fast kernel's pencil path (both variants) carries small
    # Hermitian-mirror collective-permutes — bound them to well under a
    # field so a layout regression can't hide real traffic in them
    field = NX * NX
    for txt, label in ((base, "base"), (pair, "pair")):
        assert _op_count(txt, "all-gather") == 0, label
        vperm = sum(_result_shapes(txt, "collective-permute"))
        assert vperm <= 3 * field, (label, vperm)


def test_mxu_gspmd_coupled_step_traffic_budget(mesh):
    """GSPMD chooses the MXU path's collectives; budget its gather traffic.

    Audited snapshot (jax 0.8 era, 4-dev virtual mesh, nx=128 dense DFT):
    14 all-gathers, the largest 4*128*68 elements (a batch-4 half-width
    intermediate feeding the y-pass dot), ~0.38 M elements total ≈ 23
    fields/step. A partitioning regression that gathers whole batched
    stacks or the full state costs >2x that; fail loudly there.
    """
    txt = _step_hlo_coupled(mesh, backend="mxu", dtype=np.float64, fast=True)
    field = NX * NX
    ag = _result_shapes(txt, "all-gather")
    assert sum(ag) <= 50 * field, (
        f"all-gather traffic {sum(ag)/field:.1f} fields/step exceeds the "
        f"audited 2x budget (snapshot ~23)")
    assert not ag or max(ag) <= 6 * field, (
        f"single all-gather of {max(ag)/field:.1f} fields — full-stack "
        f"gather regression")
    # the matmul-DFT must still be genuinely partitioned, not replicated
    assert (_op_count(txt, "all-to-all") + _op_count(txt, "collective-permute")
            ) > 0, "MXU step no longer exchanges shards: replicated compute?"
