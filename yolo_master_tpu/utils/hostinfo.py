"""Host + accelerator descriptors (reference parity: ultralytics/utils/cpu.py
CPUInfo:12 and utils/autodevice.py GPUInfo:11 — the device side is recast for
TPU: JAX device enumeration instead of NVML)."""

from __future__ import annotations

import platform
import re
import sys
from pathlib import Path

__all__ = ["CPUInfo", "tpu_info", "select_device_summary"]


class CPUInfo:
    """Normalized CPU brand string across Linux/macOS/Windows with graceful
    fallbacks (never raises, always returns a string)."""

    @staticmethod
    def name() -> str:
        try:
            if sys.platform.startswith("linux"):
                p = Path("/proc/cpuinfo")
                if p.exists():
                    for line in p.read_text(errors="ignore").splitlines():
                        if "model name" in line:
                            return CPUInfo._clean(line.split(":", 1)[1])
            elif sys.platform == "darwin":
                import subprocess

                s = subprocess.run(
                    ["sysctl", "-n", "machdep.cpu.brand_string"], capture_output=True, text=True
                ).stdout.strip()
                if s:
                    return CPUInfo._clean(s)
            elif sys.platform.startswith("win"):
                try:
                    import winreg as wr

                    with wr.OpenKey(wr.HKEY_LOCAL_MACHINE, r"HARDWARE\DESCRIPTION\System\CentralProcessor\0") as k:
                        val, _ = wr.QueryValueEx(k, "ProcessorNameString")
                        if val:
                            return CPUInfo._clean(val)
                except Exception:
                    pass
            s = platform.processor() or getattr(platform.uname(), "processor", "") or platform.machine()
            return CPUInfo._clean(s or "Unknown CPU")
        except Exception:
            return CPUInfo._clean(platform.machine() or "Unknown CPU")

    @staticmethod
    def _clean(s: str) -> str:
        s = re.sub(r"\s+", " ", s.strip())
        for junk in ("(TM)", "(tm)", "(R)", "(r)", "CPU "):
            s = s.replace(junk, "")
        return s.strip()

    def __str__(self) -> str:
        return self.name()


def tpu_info() -> list[dict]:
    """Per-device descriptors from JAX (the GPUInfo/NVML analog): kind,
    platform, id, process index and (when the backend exposes it) memory
    stats. Returns [] when JAX has no devices (e.g. import-time probing)."""
    try:
        import jax

        out = []
        for d in jax.devices():
            row = {
                "id": d.id,
                "kind": getattr(d, "device_kind", "unknown"),
                "platform": d.platform,
                "process_index": getattr(d, "process_index", 0),
            }
            try:
                ms = d.memory_stats()
                if ms:
                    row["bytes_in_use"] = ms.get("bytes_in_use")
                    row["bytes_limit"] = ms.get("bytes_limit")
            except Exception:
                pass
            out.append(row)
        return out
    except Exception:
        return []


def select_device_summary() -> str:
    """One-line host+device banner for logs/benchmarks."""
    devs = tpu_info()
    dev = f"{len(devs)}x {devs[0]['kind']}" if devs else "no-accelerator"
    return f"{CPUInfo.name()} | {dev} | python {platform.python_version()}"
