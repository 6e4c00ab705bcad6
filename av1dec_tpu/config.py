"""Decoder configuration.

One frozen dataclass, passed explicitly (JAX-idiomatic; no global flag
registry).  Mirrors the CLI surface of a standard AV1 decoder
(threads/output/md5) plus the TPU-specific mesh controls.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    # Host-side entropy decode worker threads (tile-parallel).
    threads: int = 1

    # Column shards over a 1-D ("space",) device mesh for the filter
    # chain (parallel/sharded_cdef.py); 0 = single device.  Falls back
    # per frame when the width isn't shard-aligned.
    space_shards: int = 0

    # Apply film grain synthesis at output [SPEC §7.18.3].  References are
    # always grain-free; this only affects emitted frames.
    apply_grain: bool = True

    # Emit frames that have show_frame == 0 (debugging aid).
    output_invisible: bool = False

    # Operating point selection for scalable streams [SPEC §5.5.3, §6.4.1].
    operating_point: int = 0

    # Limit decode to the first N shown frames (0 = no limit).
    max_frames: int = 0

    # Use the slow jnp spec-model kernels instead of Pallas (debugging /
    # CPU-only runs).
    use_spec_kernels: bool = False

    # Run pixel work on this JAX platform ("tpu", "cpu", None = default).
    platform: Optional[str] = None

    # In auto device mode, frames smaller than this (luma pixels) stay
    # on the host path: per-geometry compile + dispatch latency through
    # a remote accelerator dwarfs the compute for small frames.  An
    # explicit `platform` bypasses the heuristic.
    min_device_pixels: int = 230_000
