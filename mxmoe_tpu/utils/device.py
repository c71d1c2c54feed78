"""Device introspection (reference ``tile_config.get_gpu_info`` analog).

Reports the TPU generation and the hardware constants the perf model and
VMEM guards rely on; falls back to conservative defaults off-TPU.
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class TpuInfo:
    kind: str
    num_devices: int
    peak_bf16_tflops: float
    peak_int8_tops: float
    hbm_gbps: float
    hbm_bytes: int
    vmem_bytes: int = 16 * 1024 * 1024


# Public spec-sheet numbers per generation.
_SPECS = {
    "v5 lite": dict(peak_bf16_tflops=197.0, peak_int8_tops=394.0,
                    hbm_gbps=819.0, hbm_bytes=16 * 2**30),
    "v5e": dict(peak_bf16_tflops=197.0, peak_int8_tops=394.0,
                hbm_gbps=819.0, hbm_bytes=16 * 2**30),
    "v5p": dict(peak_bf16_tflops=459.0, peak_int8_tops=918.0,
                hbm_gbps=2765.0, hbm_bytes=95 * 2**30),
    "v4": dict(peak_bf16_tflops=275.0, peak_int8_tops=275.0,
               hbm_gbps=1228.0, hbm_bytes=32 * 2**30),
    "v6e": dict(peak_bf16_tflops=918.0, peak_int8_tops=1836.0,
                hbm_gbps=1640.0, hbm_bytes=32 * 2**30),
}


def get_tpu_info() -> TpuInfo:
    devs = jax.devices()
    kind = getattr(devs[0], "device_kind", "unknown").lower()
    for key, spec in _SPECS.items():
        if key in kind:
            return TpuInfo(kind=kind, num_devices=len(devs), **spec)
    return TpuInfo(kind=kind, num_devices=len(devs),
                   peak_bf16_tflops=197.0, peak_int8_tops=394.0,
                   hbm_gbps=819.0, hbm_bytes=16 * 2**30)


if __name__ == "__main__":
    print(get_tpu_info())
