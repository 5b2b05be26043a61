"""Roofline model: speed-of-light targets for memory-bound SpMV.

SpMV moves, per nonzero, at least Ax (4 B fp32) + Aj (4 B int32) +
an x-gather (4 B amortized), plus per row Ap (4 B) + y (4 B)
(BASELINE.md worked model). Speed of light = HBM_BW / bytes-per-nnz.
The harness prints achieved-vs-SoL so every kernel is audited against
the hardware, not against other kernels (SURVEY §7 step 7).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


# Published HBM bandwidths per chip generation (GB/s).
CHIP_HBM_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "cpu": 50.0,  # placeholder for interpret-mode runs
}


def chip_specs() -> tuple:
    """Best-effort (name, HBM GB/s) of the attached device."""
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    if "lite" in kind and "v5" in kind:
        return "v5e", CHIP_HBM_GBPS["v5e"]
    if "v5p" in kind or "v5 p" in kind:
        return "v5p", CHIP_HBM_GBPS["v5p"]
    if "v4" in kind:
        return "v4", CHIP_HBM_GBPS["v4"]
    if "v6" in kind:
        return "v6e", CHIP_HBM_GBPS["v6e"]
    if "tpu" in kind:
        return kind, CHIP_HBM_GBPS["v5e"]
    return "cpu", CHIP_HBM_GBPS["cpu"]


@dataclasses.dataclass
class RooflineModel:
    chip: str
    hbm_gbps: float
    bytes_per_nnz: float
    bytes_per_row: float

    def sol_nnz_per_s(self, mean_nnz_per_row: float) -> float:
        bytes_per_nnz_eff = self.bytes_per_nnz + self.bytes_per_row / max(
            mean_nnz_per_row, 1e-9
        )
        return self.hbm_gbps * 1e9 / bytes_per_nnz_eff

    def sol_gflops(self, mean_nnz_per_row: float) -> float:
        return 2.0 * self.sol_nnz_per_s(mean_nnz_per_row) / 1e9


def speed_of_light(
    nnz: int,
    n_rows: int,
    value_bytes: int = 4,
    index_bytes: int = 4,
    offset_bytes: int = 4,
) -> RooflineModel:
    chip, bw = chip_specs()
    return RooflineModel(
        chip=chip,
        hbm_gbps=bw,
        bytes_per_nnz=value_bytes + index_bytes + value_bytes,  # Ax + Aj + x
        bytes_per_row=offset_bytes + value_bytes,  # Ap + y
    )
