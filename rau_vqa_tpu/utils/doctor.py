"""Rig health checks: ``rau-vqa doctor``.

Operators of this framework depend on three fragile things the stack
cannot see from inside a hung call: the TPU tunnel (observed to block
``jax.devices()`` forever in a dial-retry loop rather than raise), the
native C++ loaders (toolchain/deps may be absent), and the data layout.
``doctor`` probes each with a TIMEOUT — device probes run in a
subprocess, because a hung backend init inside this process could never
be cancelled — and prints one human block plus one machine-readable JSON
line.

The reference has no equivalent (its failure mode was a hung ``th``
process); this implements SURVEY.md §5 "failure detection" at the rig
level, complementing the trainer's loss-explosion guard.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Any, Dict

_DEVICE_PROBE = """
import json, sys
import jax
{force_cpu}
ds = jax.devices()
# execution probe, not just init: a second wedge mode (observed
# 2026-08-20, after two concurrent clients collided on the tunnel) lets
# device init succeed while every dispatch hangs forever — a
# jax.devices()-only probe reports 'healthy' on a rig that cannot run a
# single op.  One tiny dispatch forced to host catches it; the
# subprocess timeout is the detection.
import numpy as np
import jax.numpy as jnp
y = np.asarray(jnp.arange(4.0) + 1.0)
assert y[3] == 4.0
print(json.dumps({{
    "n": len(ds),
    "platform": ds[0].platform,
    "kind": getattr(ds[0], "device_kind", "?"),
    "exec": "ok",
}}))
"""

_CANARY_PROBE = """
import json
from rau_vqa_tpu.utils.rigcheck import matmul_canary
print(json.dumps(matmul_canary()))
"""

_NATIVE_PROBE = """
import json
from rau_vqa_tpu.data import native
native.{loader}()
print(json.dumps({{}}))
"""


def _probe(code: str, timeout_s: float) -> Dict[str, Any]:
    """Run a snippet in a clean subprocess with a hard timeout; classify
    the outcome as ok / hung / error (a hung tunnel never raises, so the
    timeout IS the detection)."""
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"status": "hung",
                "detail": f"no response within {timeout_s:.0f}s — for the "
                          f"TPU probe this means the tunnel accepts the "
                          f"dial but device init or a one-op dispatch "
                          f"never returns (init-hang and exec-wedge modes "
                          f"both land here)"}
    if proc.returncode != 0:
        return {"status": "error",
                "detail": proc.stderr.strip().splitlines()[-1]
                if proc.stderr.strip() else f"rc={proc.returncode}"}
    try:
        out = json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return {"status": "error", "detail": f"unparseable: {proc.stdout!r}"}
    return {"status": "ok", **out}


def run_doctor(*, vqa_dir: str | None = None, canary: bool = False,
               device_timeout_s: float = 180.0,
               canary_timeout_s: float = 600.0) -> Dict[str, Any]:
    """Run all checks; returns the report dict (also used by the CLI)."""
    report: Dict[str, Any] = {}

    # library versions (import errors are themselves findings)
    versions: Dict[str, str] = {}
    for mod in ("jax", "jaxlib", "flax", "numpy", "h5py", "PIL"):
        try:
            m = __import__(mod)
            versions[mod] = getattr(m, "__version__", "?")
        except Exception as e:      # noqa: BLE001 — report, don't die
            versions[mod] = f"IMPORT FAILED: {e}"
    report["versions"] = versions

    # accelerator backend (whatever the env pins — axon/TPU here)
    report["device"] = _probe(_DEVICE_PROBE.format(force_cpu=""),
                              device_timeout_s)

    # CPU fallback: must work even when the tunnel is dead, since the
    # sitecustomize pins the platform via jax.config (overriding the
    # JAX_PLATFORMS env var) the probe forces it back through the config
    report["cpu"] = _probe(
        _DEVICE_PROBE.format(
            force_cpu='jax.config.update("jax_platforms", "cpu")'),
        device_timeout_s)

    # native libraries — probed in a SUBPROCESS with a timeout like the
    # backends: load_library may run `make`, and a wedged compiler or FS
    # stall must not hang the doctor itself (the error detail carries the
    # NativeUnavailable message, incl. make stderr on build failures)
    for key, loader in (("native_features", "load_library"),
                        ("native_images", "load_image_library")):
        r = _probe(_NATIVE_PROBE.format(loader=loader), 180.0)
        report[key] = ({"status": "ok"} if r["status"] == "ok" else r)

    if vqa_dir is not None:
        missing = [f for f in ("data_prepro.json", "data_prepro.h5")
                   if not os.path.exists(os.path.join(vqa_dir, f))]
        report["vqa_dir"] = ({"status": "ok"} if not missing else
                             {"status": "error",
                              "detail": f"missing {missing} in {vqa_dir}"})

    if canary and report["device"]["status"] == "ok":
        report["canary"] = _probe(_CANARY_PROBE, canary_timeout_s)
    elif canary:
        report["canary"] = {"status": "skipped",
                            "detail": "device probe not ok"}

    core = [report["device"], report["cpu"],
            report["native_features"], report["native_images"]]
    if vqa_dir is not None:
        core.append(report["vqa_dir"])
    if canary:
        # a requested capability check that hung or errored is a health
        # failure — automation gating on the exit code must not proceed
        # to bench on a rig whose canary just hung ('skipped' implies the
        # device probe already failed, which core catches)
        core.append(report["canary"])
    report["healthy"] = all(c["status"] in ("ok", "skipped") for c in core)
    return report


def format_report(report: Dict[str, Any]) -> str:
    lines = []
    v = report["versions"]
    lines.append("versions: " + "  ".join(f"{k}={v[k]}" for k in v))
    for key in ("device", "cpu", "native_features", "native_images",
                "vqa_dir", "canary"):
        if key not in report:
            continue
        c = report[key]
        if c["status"] == "ok":
            extra = ""
            if "platform" in c:
                extra = f" — {c['n']}x {c['platform']} ({c['kind']})"
            if "tflops" in c:
                extra = (f" — {c['tflops']} TFLOP/s "
                         f"({c['frac_of_peak'] * 100:.1f}% of v5e bf16 peak)")
            lines.append(f"  ok    {key}{extra}")
        else:
            lines.append(f"  {c['status'].upper():5s} {key} — "
                         f"{c.get('detail', '')}")
    if report["healthy"]:
        lines.append("healthy")
    else:
        lines.append("UNHEALTHY — see failed checks above")
        if (report.get("device", {}).get("status") != "ok"
                and report.get("cpu", {}).get("status") == "ok"):
            lines.append("  hint: every subcommand still works on host via "
                         "'rau-vqa --platform cpu <command> ...'")
    return "\n".join(lines)
