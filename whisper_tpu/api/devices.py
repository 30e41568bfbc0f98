"""Device enumeration + multi-host bring-up.

``list_devices`` is the listGPUs analogue (Whisper/D3D/listGPUs.cpp; API
export iContext.h:66); ``init_distributed`` wraps jax.distributed for
multi-host slices (the framework's DCN story, SURVEY.md §2.10).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DeviceInfo:
    name: str
    platform: str
    id: int
    process_index: int
    memory_gb: float


def list_devices() -> list[DeviceInfo]:
    import jax

    out = []
    for d in jax.devices():
        mem = 0.0
        try:
            stats = d.memory_stats()
            if stats and "bytes_limit" in stats:
                mem = stats["bytes_limit"] / 1e9
        except Exception:
            pass
        out.append(
            DeviceInfo(
                name=str(d),
                platform=d.platform,
                id=d.id,
                process_index=d.process_index,
                memory_gb=round(mem, 1),
            )
        )
    return out


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (jax.distributed.initialize). On TPU pods the
    arguments come from the environment; pass them explicitly elsewhere."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
