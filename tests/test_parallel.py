"""Mesh/sharding tests on the 8-virtual-device CPU backend."""

import numpy as np
import pytest


def test_mesh_creation():
    import jax

    from ttasr.parallel.sharding import create_mesh

    assert len(jax.devices()) == 8
    mesh = create_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(data=8, model=2)


def test_param_pspecs_rules():
    from jax.sharding import PartitionSpec as P

    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.model import init_params
    from ttasr.parallel.sharding import param_pspecs

    cfg = WhisperConfig(name="t", vocab_size=1864, num_mel_bins=80, d_model=64,
                        encoder_layers=2, encoder_heads=4, decoder_layers=2,
                        decoder_heads=4, ffn_dim=128)
    params = init_params(cfg, seed=0)
    specs = param_pspecs(params)
    blocks = specs["encoder"]["blocks"]
    assert blocks["wq"] == P(None, None, "model")
    assert blocks["wo"] == P(None, "model", None)
    assert blocks["w1"] == P(None, None, "model")
    assert blocks["w2"] == P(None, "model", None)
    assert blocks["ln1_s"] == P()
    assert specs["decoder"]["embed"] == P("model", None)
    assert specs["encoder"]["conv1_w"] == P()
    assert specs["decoder"]["blocks"]["wq_c"] == P(None, None, "model")


def test_sanitize_spec_handles_indivisible_dims():
    from jax.sharding import PartitionSpec as P

    from ttasr.parallel.sharding import create_mesh, sanitize_spec

    mesh = create_mesh(data=4, model=2)
    assert sanitize_spec(P("model", None), (1865, 64), mesh) == P(None, None)
    assert sanitize_spec(P("model", None), (1864, 64), mesh) == P("model", None)


def test_sharded_forward_matches_single_device():
    import jax

    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.model import forward, init_params
    from ttasr.parallel.sharding import create_mesh, shard_params

    cfg = WhisperConfig(name="t", vocab_size=256, num_mel_bins=80, d_model=64,
                        encoder_layers=2, encoder_heads=4, decoder_layers=2,
                        decoder_heads=4, ffn_dim=128, max_source_positions=32)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((4, 80, 64)).astype(np.float32)
    tokens = rng.integers(0, 256, (4, 6)).astype(np.int32)

    single = np.asarray(forward(params, cfg, mel, tokens))

    mesh = create_mesh(data=4, model=2)
    with mesh:
        sharded_params = shard_params(params, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        mel_s = jax.device_put(mel, NamedSharding(mesh, P("data", None, None)))
        tok_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
        out = np.asarray(jax.jit(
            lambda p, m, t: forward(p, cfg, m, t)
        )(sharded_params, mel_s, tok_s))
    assert np.max(np.abs(out - single)) < 2e-3


def test_dryrun_multichip_entry():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_dryrun_multichip_env_lies_about_backend():
    """Regression for VERDICT.md round-1 weak #1: the driver sets
    JAX_PLATFORMS=cpu but the sitecustomize-pinned backend has 1 device.
    The gate must inspect jax.devices(), never the env var.  Simulated
    here with a subprocess whose backend initializes with ONE cpu device
    before dryrun_multichip(8) is called — the entry must detect the
    mismatch and recover via its clean-subprocess fallback."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # env claims cpu...
    env.pop("XLA_FLAGS", None)    # ...but no virtual-device flag: 1 device
    env.pop("TTASR_DRYRUN_SUBPROCESS", None)
    env["PYTHONPATH"] = repo
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "devs = jax.devices(); assert len(devs) == 1, devs; "
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "dryrun_multichip ok" in proc.stdout


def test_entry_compiles():
    import jax

    import __graft_entry__ as graft

    fn, args = graft.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    assert compiled is not None


def test_multislice_mesh_single_slice():
    from ttasr.parallel.distributed import create_multislice_mesh, initialize_distributed

    initialize_distributed()  # no-op single process
    mesh = create_multislice_mesh(model=2)
    assert mesh.axis_names == ("dcn_data", "data", "model")
    assert mesh.shape["model"] == 2
    assert mesh.shape["dcn_data"] * mesh.shape["data"] * 2 == 8
