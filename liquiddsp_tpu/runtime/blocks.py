"""Block-level API: flex_tx / flex_rx / frame_detector_cc parity.

The reference exposes three GR blocks (include/liquiddsp/flex_tx.h:36-53,
flex_rx.h:37-51, frame_detector_cc.h:36-50) wired through message ports.
These classes provide the same surface on the TPU runtime:

- ``FlexTx``: payload PDUs in -> modulated c32 frame PDUs out; runtime
  reconfigurable via ``configure({modulation, inner_code, outer_code})``
  dict messages (lib/flex_tx_impl.cc:183-189) and the
  set_modulation/set_inner_code/set_outer_code setters (flex_tx.h:50-52).
  Out-of-range indices fall back to defaults with a warning, as the
  reference's switch defaults do (flex_tx_impl.cc:111-114, 140-145, 176-179).
- ``FlexRx``: complex stream in -> ``constellation`` / ``payload_data`` /
  ``packet_info`` ports out (lib/flex_rx_impl.cc:61-63, 217-247). No config
  parameters: frames are self-describing; payload modem/FEC come from the
  decoded header (flex_rx.h:50). Payload decoding is host-dispatched over
  per-config jitted decoders (compiled once per visited config — no
  recompiles in the adaptation loop, SURVEY.md section 7.1).
- ``FrameDetectorCC``: passthrough + detection count
  (lib/frame_detector_cc_impl.cc:66-97).

Per-config TX/RX programs are cached; each (config, payload_len) compiles
exactly once.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from liquiddsp_tpu.core.config import (
    NUM_INNER_CODES,
    NUM_MODULATIONS,
    NUM_OUTER_CODES,
    FrameConfig,
)
from liquiddsp_tpu.phy import detector as phy_detector
from liquiddsp_tpu.phy import frame_spec as fs
from liquiddsp_tpu.phy import framegen as phy_framegen
from liquiddsp_tpu.phy import framesync as phy_framesync
from liquiddsp_tpu.runtime.bus import PDU, MessageBus


from liquiddsp_tpu.utils.device import as_c64_2d as _as_device_c64_2d  # noqa: E402
# (split f32 puts + in-jit combine: raw complex64 host->device puts are
# UNIMPLEMENTED on the axon backend, utils/device.py)


@functools.lru_cache(maxsize=None)
def _tx_program(modulation: int, inner: int, outer: int, payload_len: int):
    cfg = FrameConfig(modulation, inner, outer, payload_len)
    return jax.jit(lambda p: phy_framegen.framegen(p, cfg))


@functools.lru_cache(maxsize=None)
def _payload_program(modulation: int, inner: int, outer: int, payload_len: int,
                     n_flat: int, n_take: int):
    """Gather ``n_take`` slots out of the flattened [B*K, n_syms] symbol
    buffer AND decode them as one device call (a separate gather program
    cost one extra tunnel dispatch per config group). Returns a single
    uint8 [n_take, payload_len + 1] array — payload bytes with the CRC flag
    appended as a final column — so the host needs ONE transfer per group."""
    cfg = FrameConfig(modulation, inner, outer, payload_len)

    def run(syms, evm, idx):
        s = syms.reshape((n_flat,) + syms.shape[2:])[idx]
        nv = evm.reshape(n_flat)[idx]
        payloads, crc_ok = phy_framesync.decode_payload_symbols(
            s, cfg, noise_var=nv
        )
        return jnp.concatenate(
            [payloads, crc_ok[:, None].astype(jnp.uint8)], axis=-1
        )

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _sync_program(n_syms: int, max_frames: int, threshold: float):
    """sync_common plus one packed [10, B, K] f32 plane so the host reads
    every per-slot scalar (mask/header/config/stats) in ONE transfer —
    nine separate np.asarray fetches cost nine tunnel round trips."""

    def run(x):
        det, syms, (hdr_valid, user, plen, mod, inner, outer), evm_lin = (
            phy_framesync.sync_common(x, n_syms, max_frames, threshold)
        )
        packed = jnp.stack(
            [
                det.mask.astype(jnp.float32),
                hdr_valid.astype(jnp.float32),
                plen.astype(jnp.float32),
                mod.astype(jnp.float32),
                inner.astype(jnp.float32),
                outer.astype(jnp.float32),
                evm_lin,
                det.gamma,
                det.dphi,
                det.start.astype(jnp.float32),
            ]
        )
        return syms, evm_lin, packed

    return jax.jit(run)


class FlexTx:
    """Packet transmitter block (flex_tx parity)."""

    def __init__(
        self,
        modulation: int = 0,
        inner_code: int = 0,
        outer_code: int = 0,
        bus: MessageBus | None = None,
    ):
        self.bus = bus or MessageBus()
        self.set_modulation(modulation)
        self.set_inner_code(inner_code)
        self.set_outer_code(outer_code)
        self.header_user = None  # 14 zero bytes by default
        self.num_frames = 0  # d_num_frames (lib/flex_tx_impl.cc:49)
        self.bus.subscribe("pdus_in", self.send_pkt)
        self.bus.subscribe("configuration", self.configure)

    def set_modulation(self, modulation: int):
        if not 0 <= int(modulation) < NUM_MODULATIONS:
            warnings.warn("Unsupported Modulation Defaulting to BPSK.")
            modulation = 0
        self.modulation = int(modulation)

    def set_inner_code(self, inner_code: int):
        if not 0 <= int(inner_code) < NUM_INNER_CODES:
            warnings.warn("Unsupported FEC Defaulting to none.")
            inner_code = 0
        self.inner_code = int(inner_code)

    def set_outer_code(self, outer_code: int):
        if not 0 <= int(outer_code) < NUM_OUTER_CODES:
            warnings.warn("Unsupported FEC Defaulting to none.")
            outer_code = 0
        self.outer_code = int(outer_code)

    def configure(self, configuration: dict):
        """Config dict message handler (lib/flex_tx_impl.cc:183-189)."""
        if "modulation" in configuration:
            self.set_modulation(configuration["modulation"])
        if "inner_code" in configuration:
            self.set_inner_code(configuration["inner_code"])
        if "outer_code" in configuration:
            self.set_outer_code(configuration["outer_code"])

    def send_pkt(self, pdu: PDU | np.ndarray) -> PDU:
        """Assemble + modulate one (or a batch of) payloads; publish the
        frame PDU on ``pdus`` (lib/flex_tx_impl.cc:191-209)."""
        payload = pdu.data if isinstance(pdu, PDU) else pdu
        payload = jnp.atleast_2d(jnp.asarray(payload, dtype=jnp.uint8))
        prog = _tx_program(
            self.modulation, self.inner_code, self.outer_code, payload.shape[-1]
        )
        frames = prog(payload)
        out = PDU(
            meta={
                "modulation": self.modulation,
                "inner_code": self.inner_code,
                "outer_code": self.outer_code,
            },
            data=frames,
        )
        self.bus.publish("pdus", out)
        self.num_frames += payload.shape[0]
        return out


class FlexRx:
    """Packet receiver block (flex_rx parity): self-describing frames,
    host-dispatched per-config payload decode."""

    def __init__(
        self,
        max_payload_len: int = 64,
        max_frames_per_block: int = 8,
        threshold: float = 0.45,
        bus: MessageBus | None = None,
    ):
        self.bus = bus or MessageBus()
        self.max_payload_len = max_payload_len
        self.max_frames = max_frames_per_block
        self.threshold = threshold
        # symbol buffer sized for the longest config at max payload
        self.n_syms = fs.max_frame_spec(max_payload_len).frame_syms
        self.num_packets = 0
        self.bus.subscribe("stream_in", self.work)

    def work(self, x) -> list[dict]:
        """Process a [B, T] (or [T]) sample block; publish constellation /
        payload_data / packet_info per decoded frame (lib/flex_rx_impl.cc:
        203-253). Returns the list of packet_info dicts.

        Payload decode is batched by header config: all header-valid frames
        sharing (mod, inner, outer, plen) decode as ONE device call on a
        power-of-2-padded [G, n_syms] stack (bounded jit variants per
        config), instead of one device round-trip per frame — the closed
        adaptation loop is otherwise host-dispatch-bound (the reference's
        per-packet callback loop, lib/flex_rx_impl.cc:203-253, is sequential
        by construction; this is its block-dense analog)."""
        return self.work_complete(self.work_submit(x))

    def work_submit(self, x, expected_configs=None):
        """Dispatch the sync program for a block WITHOUT waiting — returns an
        opaque handle for :meth:`work_complete`. Splitting submit/complete
        lets a closed-loop driver overlap generation N+1's device work with
        generation N's host-side feedback processing (bench/adapt_loop.py
        --pipeline): the blocking packed-sync fetch then rides on top of the
        next generation's compute instead of serializing with it.

        ``expected_configs``: optional per-channel [(mod, inner, outer,
        payload_len), ...] — the configs the caller COMMANDED (a closed-loop
        TX knows them). When given, the payload decode for detection slot 0
        of each channel is dispatched SPECULATIVELY now, before the sync
        results are read, removing the second device round trip per block.
        work_complete uses a speculative row only when the decoded header
        confirms the commanded config and the frame landed in slot 0 (the
        decode inputs are then identical to the fallback's — same program,
        same gather index — so results are bit-identical); any other slot
        falls back to the normal grouped decode."""
        x = _as_device_c64_2d(x)
        sync = _sync_program(self.n_syms, self.max_frames, self.threshold)
        syms, evm_lin, packed = sync(x)
        try:  # start the device->host copy early (overlaps remaining compute)
            packed.copy_to_host_async()
        except Exception:  # noqa: BLE001 — optional fast path only
            pass
        spec = None
        if expected_configs is not None:
            K = self.max_frames
            n_flat = x.shape[0] * K
            by_cfg: dict[tuple[int, int, int, int], list[int]] = {}
            for ch, (m, i, o, pl) in enumerate(expected_configs):
                by_cfg.setdefault((int(m), int(i), int(o), int(pl)), []).append(ch)
            spec = {}
            for (m, i, o, pl), chans in by_cfg.items():
                g_pad = 1 << (len(chans) - 1).bit_length()
                flat_idx = np.array(
                    [b * K for b in chans] + [chans[0] * K] * (g_pad - len(chans)),
                    dtype=np.int32,
                )
                dev = _payload_program(m, i, o, pl, n_flat, g_pad)(
                    syms, evm_lin, flat_idx
                )
                try:
                    dev.copy_to_host_async()
                except Exception:  # noqa: BLE001
                    pass
                spec[(m, i, o, pl)] = (chans, dev)
        return syms, evm_lin, packed, spec

    def work_complete(self, handle) -> list[dict]:
        """Finish a :meth:`work_submit` block: fetch the packed sync planes,
        batch-decode payloads per header config, publish ports, return
        packet_info dicts."""
        syms, evm_lin, packed, spec = handle
        P = np.asarray(packed)  # [10, B, K] — the block's ONLY sync fetch
        mask = P[0] > 0.5
        hdr_valid = P[1] > 0.5
        plen_h = P[2].astype(np.int64)
        mod_h = P[3].astype(np.int64)
        inner_h = P[4].astype(np.int64)
        outer_h = P[5].astype(np.int64)
        evm_h = P[6]
        rssi_h = 20.0 * np.log10(np.maximum(P[7], 1e-12))
        cfo_h = P[8]
        start_h = P[9].astype(np.int64)
        infos: list[dict] = []

        # group header-valid slots by decoded config
        groups: dict[tuple[int, int, int, int], list[tuple[int, int]]] = {}
        want_const = self.bus.has_subscribers("constellation")
        for b, k in zip(*np.nonzero(mask)):
            # constellation published regardless of validity (cc:217-221);
            # the per-slot device gather is skipped when nobody subscribes
            if want_const:
                self.bus.publish("constellation", PDU(meta={}, data=syms[b, k]))
            if not hdr_valid[b, k]:
                continue
            m, i, o, pl = (
                int(mod_h[b, k]), int(inner_h[b, k]),
                int(outer_h[b, k]), int(plen_h[b, k]),
            )
            if not (
                0 <= m < NUM_MODULATIONS
                and 0 <= i < NUM_INNER_CODES
                and 0 <= o < NUM_OUTER_CODES
                and 0 < pl <= self.max_payload_len
            ):
                continue
            groups.setdefault((m, i, o, pl), []).append((int(b), int(k)))

        K = mask.shape[1]
        n_flat = mask.shape[0] * K
        # dispatch EVERY group's decode before fetching ANY result, with
        # async host copies started as soon as each dispatch lands — the
        # transfers then overlap each other and the remaining device work
        # (one round-trip of latency for the whole block instead of one per
        # config group; the tunneled backend charges ~ms per blocking fetch).
        # Slots whose decode was already dispatched speculatively at submit
        # time (header config == commanded config AND slot 0) reuse that
        # result — bit-identical inputs — so a fully-confirmed block needs
        # NO new dispatch here at all.
        pending = []
        for (m, i, o, pl), slots in groups.items():
            covered: dict[tuple[int, int], tuple] = {}
            rest = list(slots)
            if spec and (m, i, o, pl) in spec:
                chans, sdev = spec[(m, i, o, pl)]
                row = {ch: j for j, ch in enumerate(chans)}
                rest = []
                for b, k in slots:
                    if k == 0 and b in row:
                        covered[(b, k)] = (sdev, row[b])
                    else:
                        rest.append((b, k))
            dev = None
            if rest:
                g = len(rest)
                g_pad = 1 << (g - 1).bit_length()  # power-of-2 bucket
                flat_idx = np.array(
                    [b * K + k for b, k in rest] + [rest[0][0] * K + rest[0][1]] * (g_pad - g),
                    dtype=np.int32,
                )
                dev = _payload_program(m, i, o, pl, n_flat, g_pad)(
                    syms, evm_lin, flat_idx
                )
                try:
                    dev.copy_to_host_async()
                except Exception:  # noqa: BLE001 — optional fast path only
                    pass
            pending.append(((m, i, o, pl), slots, covered, rest, dev))
        _fetched: dict[int, np.ndarray] = {}

        def _row(dev, j):
            buf = _fetched.get(id(dev))
            if buf is None:
                buf = np.asarray(dev)
                _fetched[id(dev)] = buf
            return buf[j]

        for (m, i, o, pl), slots, covered, rest, dev in pending:
            rest_j = {bk: j for j, bk in enumerate(rest)}
            for b, k in slots:
                if (b, k) in covered:
                    sdev, j = covered[(b, k)]
                    out_row = _row(sdev, j)
                else:
                    out_row = _row(dev, rest_j[(b, k)])
                payload = out_row[:-1]
                payload_valid = bool(out_row[-1] != 0)
                if payload_valid:
                    self.bus.publish("payload_data", PDU(meta={}, data=payload))
                # framesyncstats_s parity: EVM/RSSI/CFO alongside the config
                # fields (lib/flex_rx_impl.cc:198, 236-247)
                info = {
                    "header_valid": 1,
                    "payload_valid": int(payload_valid),
                    "modulation": m,
                    "inner_code": i,
                    "outer_code": o,
                    "payload_len": pl,
                    "payload": payload,
                    "evm": float(10.0 * np.log10(max(evm_h[b, k], 1e-12))),
                    "rssi": float(rssi_h[b, k]),
                    "cfo": float(cfo_h[b, k]),
                    "start": int(start_h[b, k]),
                    "batch": int(b),
                }
                self.bus.publish("packet_info", info)
                infos.append(info)
                self.num_packets += 1
        # stable frame order across the batch (detection order within channel)
        infos.sort(key=lambda d: (d["batch"], d["start"]))
        return infos


class FrameDetectorCC:
    """Standalone detector block (frame_detector_cc parity): complex
    passthrough + detection counter."""

    def __init__(self, threshold: float = 0.45, max_frames: int = 16):
        self.threshold = threshold
        self.max_frames = max_frames
        self.num_frames = 0
        self._prog = jax.jit(
            lambda x: phy_detector.detect(x, self.max_frames, self.threshold)
        )

    def work(self, x):
        x = _as_device_c64_2d(x)
        det = self._prog(x)
        self.num_frames += int(np.asarray(det.mask).sum())
        return x, det
