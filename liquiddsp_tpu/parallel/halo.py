"""Time-block-sharded streaming RX with ppermute halo exchange.

BASELINE config 5: a contiguous sample stream is split into time blocks over
the mesh ``time`` axis. A frame may straddle a block boundary — the
single-chip streaming contract (runtime/stream.py overlap carry, mirroring
liquid's carry-state across 256-sample chunks, SURVEY.md section 5.7)
becomes a neighbor halo exchange over ICI:

- every shard sends the first ``frame_samples - 1`` samples of its block to
  its LEFT neighbor (lax.ppermute ring, one hop over ICI);
- each shard decodes frames *starting* inside its own block, using the halo
  to complete frames that extend into the right neighbor;
- the last shard's right halo is zero (end of stream) — or, in continuous
  operation, the head of the next super-block (runtime carry).

Ownership (start < T_local) guarantees each frame is decoded exactly once,
with no barrier: the only collective is the one ppermute.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from liquiddsp_tpu.core.config import FrameConfig
from liquiddsp_tpu.parallel.mesh import CH_AXIS, TIME_AXIS
from liquiddsp_tpu.phy import frame_spec as fs
from liquiddsp_tpu.phy.framesync import FrameResults, framesync_fixed


def _halo_dma_kernel(
    xr_ref, xi_ref, or_ref, oi_ref, lsem, ssem, rsem, *, t_local, ov, n_time,
    interpret,
):
    """Per-shard window builder with in-kernel neighbor RDMA.

    Builds window = [x_local | head-of-right-neighbor] directly in the
    output buffer: the local block goes in with two async HBM->HBM copies
    and the halo arrives via ``make_async_remote_copy`` — each shard pushes
    its first ``ov`` samples straight into its LEFT neighbor's window tail
    over ICI (SURVEY.md section 2.4 collective row, section 7.2 step 7), no
    separate ppermute materialization + concat.

    Alignment contract (CLAUDE.md axon-backend rules): whole-array ANY-space
    refs; src offset 0 and dst offset ``t_local`` are 128-multiples; ``ov``
    is a 128-multiple; sublane dim padded to 8 by the caller.
    """
    my = jax.lax.axis_index(TIME_AXIS)
    left = jax.lax.rem(my - 1 + n_time, n_time)
    # device_id as a {time: left} dict (MESH type): on a multi-axis mesh the
    # unspecified axes default to this device's own coordinates, so the same
    # kernel serves the (time, ch) production mesh on TPU. The CPU
    # interpreter is single-axis only and wants the bare index.
    target = left if interpret else {TIME_AXIS: left}
    cpr = pltpu.make_async_copy(xr_ref, or_ref.at[:, :t_local], lsem.at[0])
    cpi = pltpu.make_async_copy(xi_ref, oi_ref.at[:, :t_local], lsem.at[1])
    cpr.start()
    cpi.start()
    rdr = pltpu.make_async_remote_copy(
        src_ref=xr_ref.at[:, :ov],
        dst_ref=or_ref.at[:, t_local:],
        send_sem=ssem.at[0],
        recv_sem=rsem.at[0],
        device_id=target,
    )
    rdi = pltpu.make_async_remote_copy(
        src_ref=xi_ref.at[:, :ov],
        dst_ref=oi_ref.at[:, t_local:],
        send_sem=ssem.at[1],
        recv_sem=rsem.at[1],
        device_id=target,
    )
    rdr.start()
    rdi.start()
    cpr.wait()
    cpi.wait()
    rdr.wait()
    rdi.wait()


def _window_with_halo_dma(x_local: jax.Array, overlap: int, n_time: int) -> jax.Array:
    """[B, T_local] complex (inside shard_map) -> [B, T_local + ov_pad]
    window via the remote-DMA kernel; ov_pad = overlap rounded up to 128.
    The wrap-around tail of the LAST shard (which receives shard 0's head)
    is NOT zeroed here — the caller masks it exactly as in the ppermute
    path."""
    b, t_local = x_local.shape
    assert t_local % 128 == 0, f"time shard {t_local} must be a 128-multiple"
    ov = -(-overlap // 128) * 128
    assert ov <= t_local, f"overlap {ov} exceeds shard {t_local}"
    b_pad = -(-b // 8) * 8
    xr = jnp.real(x_local).astype(jnp.float32)
    xi = jnp.imag(x_local).astype(jnp.float32)
    if b_pad != b:
        xr = jnp.pad(xr, ((0, b_pad - b), (0, 0)))
        xi = jnp.pad(xi, ((0, b_pad - b), (0, 0)))
    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(
        _halo_dma_kernel, t_local=t_local, ov=ov, n_time=n_time,
        interpret=interpret,
    )
    oshape = jax.ShapeDtypeStruct((b_pad, t_local + ov), jnp.float32)
    wr, wi = pl.pallas_call(
        kernel,
        out_shape=[oshape, oshape],
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xr, xi)
    return (wr[:b] + 1j * wi[:b]).astype(jnp.complex64)


def sharded_framesync(
    x: jax.Array,
    cfg: FrameConfig,
    mesh,
    max_frames_per_shard: int = 8,
    threshold: float = 0.45,
    halo: str = "auto",
) -> FrameResults:
    """RX over a [B, T] stream sharded P(ch, time) on ``mesh``.

    Returns FrameResults with [B, n_time * K] slots; ``start`` entries are
    absolute stream indices. Runs as one shard_map program: local dense
    framesync + one halo exchange.

    ``halo`` selects the exchange implementation:
      "ppermute" — lax.ppermute of each shard's head + concat (XLA
                   collective; works on any backend);
      "dma"      — fused Pallas kernel: each shard RDMAs its head straight
                   into the left neighbor's window buffer
                   (pltpu.make_async_remote_copy over ICI) while the local
                   block is DMA'd alongside — no separate halo
                   materialization (SURVEY.md section 7.2 step 7). Runs in
                   interpret mode on CPU meshes (same code path, jnp
                   semantics).
      "auto"     — the LIQUIDDSP_HALO_BACKEND env var, else "ppermute".
    Both paths produce identical decodes (tests/test_parallel.py pins it).
    """
    if halo == "auto":
        halo = os.environ.get("LIQUIDDSP_HALO_BACKEND", "ppermute")
    spec = fs.FrameSpec(cfg)
    frame_samples = spec.frame_samples
    overlap = frame_samples - 1
    n_time = mesh.shape[TIME_AXIS]

    # Pallas interpret mode (CPU) supports remote DMA only in a
    # single-named-axis env; when the ch axis is trivial, run the whole
    # program on a time-only view of the same devices. Real-TPU Mosaic
    # lowering handles the full (time, ch) mesh via the dict device_id.
    run_mesh = mesh
    ch = CH_AXIS
    if halo == "dma" and jax.default_backend() == "cpu":
        if mesh.shape[CH_AXIS] != 1:
            raise NotImplementedError(
                "halo='dma' on the CPU interpreter needs n_ch == 1 "
                "(Pallas interpret-mode RDMA is single-axis only)"
            )
        from jax.sharding import Mesh

        run_mesh = Mesh(mesh.devices.reshape(-1), (TIME_AXIS,))
        ch = None

    @functools.partial(
        shard_map,
        mesh=run_mesh,
        in_specs=P(ch, TIME_AXIS),
        out_specs=FrameResults(
            mask=P(ch, TIME_AXIS),
            header_valid=P(ch, TIME_AXIS),
            payload_valid=P(ch, TIME_AXIS),
            modulation=P(ch, TIME_AXIS),
            inner_code=P(ch, TIME_AXIS),
            outer_code=P(ch, TIME_AXIS),
            payload_len=P(ch, TIME_AXIS),
            header_user=P(ch, TIME_AXIS, None),
            payload=P(ch, TIME_AXIS, None),
            symbols=P(ch, TIME_AXIS, None),
            evm=P(ch, TIME_AXIS),
            rssi=P(ch, TIME_AXIS),
            cfo=P(ch, TIME_AXIS),
            start=P(ch, TIME_AXIS),
        ),
        check_vma=False,
    )
    def run(x_local):
        t_local = x_local.shape[-1]
        tidx = jax.lax.axis_index(TIME_AXIS)
        if halo == "dma":
            window = _window_with_halo_dma(x_local, overlap, n_time)
            # the last shard's tail wrapped around to shard 0's head —
            # zero it with a fused iota mask (no concat copy)
            keep = (jnp.arange(window.shape[-1]) < t_local) | (tidx != n_time - 1)
            window = window * keep.astype(jnp.float32)
        else:
            # halo: my head -> left neighbor's tail; shard i receives i+1's
            head = x_local[:, :overlap]
            perm = [(i, (i - 1) % n_time) for i in range(n_time)]
            h = jax.lax.ppermute(head, TIME_AXIS, perm)
            # the last shard wrapped around to shard 0's head — zero it
            h = jnp.where(tidx == n_time - 1, jnp.zeros_like(h), h)
            window = jnp.concatenate([x_local, h], axis=-1)
        res = framesync_fixed(
            window, cfg, max_frames=max_frames_per_shard, threshold=threshold
        )
        own = res.start < t_local  # frames starting in my block are mine
        import dataclasses

        return dataclasses.replace(
            res,
            mask=res.mask & own,
            header_valid=res.header_valid & own,
            payload_valid=res.payload_valid & own,
            start=res.start + tidx * t_local,
        )

    return run(x)


def shard_stream(x, mesh):
    """Place a replicated/host [B, T] stream with P(ch, time) sharding."""
    return jax.device_put(x, NamedSharding(mesh, P(CH_AXIS, TIME_AXIS)))
