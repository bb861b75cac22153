"""Pallas remote-DMA halo exchange (the hand-rolled all_to_all).

The halo path (parallel/halo.py) ships boundary rows with ONE
``lax.all_to_all`` and relies on XLA's async-collective scheduler to
overlap the wire time with owner-local aggregation. This module is the
step beyond that (SURVEY.md §7.6 stretch goal): the exchange as an
explicit Pallas kernel issuing **inter-chip remote DMAs**, so the kernel
itself controls the overlap — every peer copy is started up front, local
work (here: the self-block move) proceeds while rows fly, and the kernel
joins on per-peer receive semaphores only at the end. This is the
building block for fusing the halo-segment aggregation into the exchange
(consume tile p as soon as recv_sem[p] fires instead of joining on all).

Semantics: drop-in for ``jax.lax.all_to_all(send, axis, 0, 0)`` inside
``shard_map`` — device q's output block ``out[p]`` is what device p sent
to q (``send[q]`` on p). The reference has no distributed backend at all
(SURVEY.md §2: no torch.distributed anywhere); this is TPU-native ICI
programming, not a translation.

Safety: a barrier-semaphore rendezvous runs before any remote write, so
no peer can land rows in ``out`` before every device has entered the
kernel and allocated its output. Each (sender, step) pair writes a
disjoint ``out`` block and signals a distinct receive-semaphore slot —
no buffer reuse, so no cross-step races (checked: the interpret-mode
tests run with ``detect_races=True``).

On CPU/testing the kernel runs under the Pallas TPU **interpreter**
(``pltpu.InterpretParams``), which emulates remote DMAs + semaphores
across the virtual mesh with vector-clock race detection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _a2a_kernel(send_ref, out_ref, send_sem, recv_sem, *, s_n: int,
                axis: str):
    my = jax.lax.axis_index(axis)

    # rendezvous: nobody issues a remote write until every peer has
    # entered the kernel (outputs allocated, semaphores live)
    barrier = pltpu.get_barrier_semaphore()
    for k in range(1, s_n):
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=jax.lax.rem(my + k, s_n),
            device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, s_n - 1)

    # start EVERY peer copy up front: step k ships send[(my+k) % S]
    # straight into the peer's out[my] block. Distinct dst blocks and
    # distinct semaphore slots per step -> no reuse, maximal overlap.
    copies = []
    for k in range(1, s_n):
        dst = jax.lax.rem(my + k, s_n)
        rdma = pltpu.make_async_remote_copy(
            src_ref=send_ref.at[pl.ds(dst, 1)],
            dst_ref=out_ref.at[pl.ds(my, 1)],
            send_sem=send_sem.at[k - 1],
            recv_sem=recv_sem.at[k - 1],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        copies.append(rdma)

    # local work overlaps with the wire: the self block never leaves the
    # chip (this is where a fused halo aggregation would run)
    out_ref[pl.ds(my, 1)] = send_ref[pl.ds(my, 1)]

    # join: for the copy of step k, the SENDER p satisfies
    # (p + k) % S == my, and it signalled recv slot k-1 here.
    for rdma in copies:
        rdma.wait()


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def halo_exchange_pallas(send: jnp.ndarray, axis_name: str,
                         interpret=False) -> jnp.ndarray:
    """``[S, H, d] -> [S, H, d]`` all-to-all over ``axis_name`` via remote
    DMAs. Must run inside ``shard_map``; ``send.shape[0]`` must equal the
    mesh axis size. ``interpret``: a ``pltpu.InterpretParams`` (or True)
    for the CPU-emulated mesh.

    Differentiable: the block permutation is an involution (exchanging
    twice restores the layout — see the round-trip test), so the VJP is
    the exchange itself applied to the cotangents, exactly like the
    ``lax.all_to_all`` transpose it replaces."""
    return _exchange_impl(send, axis_name, interpret)


def _exchange_impl(send, axis_name, interpret):
    s_n = send.shape[0]
    if interpret is True:
        interpret = pltpu.InterpretParams(detect_races=True)
    return pl.pallas_call(
        functools.partial(_a2a_kernel, s_n=s_n, axis=axis_name),
        out_shape=jax.ShapeDtypeStruct(send.shape, send.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((max(s_n - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(s_n - 1, 1),)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=0),
        interpret=interpret or False,
    )(send)


halo_exchange_pallas.defvjp(
    lambda send, axis, interp: (_exchange_impl(send, axis, interp), None),
    lambda axis, interp, _, g: (_exchange_impl(g, axis, interp),))
