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
    args = parser.parse_args(argv)

    report = {
        "python": sys.version.split()[0],
        "modules": check_modules(),
        "devices": check_devices(),
        "model_dir": check_model_dir(args.model_dir),
        "native": check_native(),
    }
    if args.probe:
        import asyncio

        report["server"] = asyncio.run(probe_server(args.probe))
    print(json.dumps(report, indent=2, ensure_ascii=False))
    return report


if __name__ == "__main__":
    main()
