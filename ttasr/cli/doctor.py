"""Environment/deployment checker.

Replaces the reference's ``api/build.py`` (dependency audit, model-dir
validation, service launch probe — reference build.py:285-334,425-455).
pip-installing is out of scope on the TPU image; this checks imports,
devices, model dirs, the native library, and optionally probes a running
API server.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
from typing import Dict, List

REQUIRED_MODULES = [
    "jax", "numpy", "aiohttp", "optax", "orbax.checkpoint", "regex",
]
OPTIONAL_MODULES = ["scipy", "transformers", "tokenizers", "Levenshtein"]

MODEL_FILES = ("config.json",)
MODEL_WEIGHTS = ("model.safetensors", "pytorch_model.bin")


def check_modules() -> Dict[str, str]:
    status = {}
    for name in REQUIRED_MODULES:
        try:
            importlib.import_module(name)
            status[name] = "ok"
        except ImportError as exc:
            status[name] = f"MISSING ({exc})"
    for name in OPTIONAL_MODULES:
        try:
            importlib.import_module(name)
            status[name] = "ok (optional)"
        except ImportError:
            status[name] = "missing (optional)"
    return status


def check_devices() -> Dict[str, object]:
    try:
        import jax

        devices = jax.devices()
        return {
            "platform": devices[0].platform if devices else "none",
            "device_count": len(devices),
            "devices": [str(d) for d in devices],
        }
    except Exception as exc:
        return {"error": str(exc)}


def check_model_dir(path: str) -> Dict[str, object]:
    """Model directory validation (reference build.py:425-455 semantics,
    HF layout instead of CT2's model.bin)."""
    result: Dict[str, object] = {"path": path, "exists": os.path.isdir(path)}
    if not result["exists"]:
        return result
    missing = [f for f in MODEL_FILES if not os.path.exists(os.path.join(path, f))]
    has_weights = any(
        os.path.exists(os.path.join(path, w)) for w in MODEL_WEIGHTS
    ) or os.path.exists(os.path.join(path, "model.safetensors.index.json"))
    result["missing_files"] = missing
    result["has_weights"] = has_weights
    result["has_tokenizer"] = os.path.exists(os.path.join(path, "tokenizer.json"))
    result["ok"] = not missing and has_weights
    return result


def check_native() -> Dict[str, object]:
    try:
        from ttasr import native

        return {"built": native.available()}
    except Exception as exc:
        return {"built": False, "error": str(exc)}


# module name -> pip distribution (reference build.py keeps such a map)
_PIP_NAMES = {
    "orbax.checkpoint": "orbax-checkpoint",
    "Levenshtein": "python-Levenshtein",
}
# per-package timeout + failure tolerance (reference build.py:155-226:
# slow/optional packages get longer timeouts and may fail without
# aborting the build)
_INSTALL_TIMEOUTS = {"jax": 600, "transformers": 600}
_TOLERATED = set(OPTIONAL_MODULES)


def install_missing(module_status: Dict[str, str]) -> Dict[str, object]:
    """pip-install missing modules (reference build.py:155-226).

    Explicitly opt-in (``--install-missing``): the TPU image bakes every
    dependency in and has zero egress, so this path is for external
    deployments.  Optional packages tolerate failure; required ones
    report it.
    """
    import subprocess

    out: Dict[str, object] = {}
    for name, status in module_status.items():
        if not status.lower().startswith("missing"):
            continue
        pip_name = _PIP_NAMES.get(name, name)
        timeout = _INSTALL_TIMEOUTS.get(name, 300)
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pip", "install", pip_name],
                capture_output=True, text=True, timeout=timeout,
            )
            if proc.returncode == 0:
                out[name] = "installed"
            elif name in _TOLERATED:
                out[name] = f"failed (tolerated): {proc.stderr[-200:]}"
            else:
                out[name] = f"FAILED: {proc.stderr[-200:]}"
        except Exception as exc:  # timeout, no pip, no network
            out[name] = (f"failed (tolerated): {exc}" if name in _TOLERATED
                         else f"FAILED: {exc}")
    return out


def launch_server(host: str = "127.0.0.1", port: int = 5000,
                  timeout_s: float = 120.0) -> Dict[str, object]:
    """Start the combined API app and poll until ready (reference
    build.py:503-849: port pre-check, subprocess launch, readiness
    probe).  The server keeps running after the doctor exits; the
    report carries its pid."""
    import socket
    import subprocess
    import time
    import urllib.request

    # port pre-check (reference checks and warns, build.py:528-541)
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as sock:
        sock.settimeout(1)
        if sock.connect_ex((host, port)) == 0:
            return {"launched": False,
                    "error": f"port {port} already in use"}

    env = dict(os.environ)
    env.setdefault("PYTHONIOENCODING", "utf-8")
    env["TTASR_API_HOST"] = host
    env["TTASR_API_PORT"] = str(port)
    proc = subprocess.Popen(
        [sys.executable, "-m", "ttasr.api.app"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    t0 = time.time()
    url = f"http://{host}:{port}/api/health"
    while time.time() - t0 < timeout_s:
        if proc.poll() is not None:
            return {"launched": False, "pid": proc.pid,
                    "error": f"server exited with {proc.returncode}"}
        try:
            with urllib.request.urlopen(url, timeout=2) as resp:
                if resp.status == 200:
                    return {"launched": True, "pid": proc.pid,
                            "ready_in_s": round(time.time() - t0, 1),
                            "url": f"http://{host}:{port}"}
        except Exception:
            pass
        time.sleep(0.5)
    proc.terminate()
    return {"launched": False, "pid": proc.pid,
            "error": f"not ready within {timeout_s}s"}


async def probe_server(base_url: str) -> Dict[str, object]:
    """Hit the health endpoints of a running combined app
    (the reference's WS readiness probe, build.py:503-849)."""
    import aiohttp

    out: Dict[str, object] = {}
    async with aiohttp.ClientSession() as session:
        for name, path in (
            ("api", "/api/health"),
            ("auth", "/api/v1/health"),
            ("streaming", "/stream/health"),
        ):
            try:
                async with session.get(base_url + path, timeout=aiohttp.ClientTimeout(total=5)) as resp:
                    out[name] = {"status": resp.status, "body": await resp.json()}
            except Exception as exc:
                out[name] = {"error": str(exc)}
    return out


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser(description="ttasr environment check")
    parser.add_argument("--model-dir", default=os.getenv("TTASR_MODEL_PATH", "models"))
    parser.add_argument("--probe", default=None,
                        help="base URL of a running API server to probe")
    parser.add_argument("--install-missing", action="store_true",
                        help="pip-install missing modules (reference "
                             "build.py behavior; off by default — the "
                             "TPU image bakes deps in)")
    parser.add_argument("--launch", action="store_true",
                        help="start the combined API app and wait for "
                             "readiness (reference build.py launch+probe)")
    parser.add_argument("--launch-port", type=int,
                        default=int(os.getenv("TTASR_API_PORT", "5000")))
    parser.add_argument("--launch-timeout", type=float, default=120.0)
    args = parser.parse_args(argv)

    report = {
        "python": sys.version.split()[0],
        "modules": check_modules(),
        "devices": check_devices(),
        "model_dir": check_model_dir(args.model_dir),
        "native": check_native(),
    }
    if args.install_missing:
        report["installs"] = install_missing(report["modules"])
        report["modules"] = check_modules()  # re-audit after installing
    if args.launch:
        report["launch"] = launch_server(port=args.launch_port,
                                         timeout_s=args.launch_timeout)
        if report["launch"].get("launched"):
            import asyncio

            report["server"] = asyncio.run(
                probe_server(report["launch"]["url"]))
    if args.probe:
        import asyncio

        report["server"] = asyncio.run(probe_server(args.probe))
    print(json.dumps(report, indent=2, ensure_ascii=False))
    return report


if __name__ == "__main__":
    main()
