"""Batch transcription engine: the faster-whisper replacement.

``WhisperEngine`` reproduces the ``WhisperModel`` API surface the
reference uses everywhere (``asr_core.py:141,159``, ``api/file_asr.py:188,
280,457``, ``faster_whisper_asr.py:107,170``):

    engine = WhisperEngine("models", compute_type="bfloat16")
    segments, info = engine.transcribe(
        audio, language="zh", beam_size=5, vad_filter=True,
        condition_on_previous_text=True, initial_prompt="")

Internals are TPU-native: one jitted beam/greedy decode per window shape,
the Whisper 30 s seek loop with timestamp-token parsing, faster-whisper's
temperature fallback ladder (compression-ratio / avg-logprob gates),
``condition_on_previous_text`` prompt carry with reset-on-high-temperature,
and VAD chunk collection + timestamp restoration.
"""

from __future__ import annotations

import asyncio
import dataclasses
import logging
import time
from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np

from ttasr.audio.io import load_audio
from ttasr.audio.vad import (
    SpeechTimestampsMap,
    VadOptions,
    collect_chunks,
    get_speech_timestamps,
)
from ttasr.engine.results import Segment, TranscriptionInfo
from ttasr.models.whisper.config import WhisperConfig
from ttasr.models.whisper.decode import (
    MAX_PROMPT,
    SAMPLE_LEN,
    DecodingOptions,
    TokenizerInfo,
    beam_decode,
    build_prompt,
    compression_ratio,
    greedy_decode,
    pad_prompts,
)
from ttasr.models.whisper.load import load_whisper
from ttasr.models.whisper.model import encode
from ttasr.ops.mel import HOP_LENGTH, N_FRAMES, N_SAMPLES, SAMPLE_RATE, log_mel_spectrogram
from ttasr.text.tokenizer import WhisperTokenizer, load_tokenizer

logger = logging.getLogger("ttasr.engine")

FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 100
TIME_PRECISION = 0.02

# Host VAD runs off the event loop in a DEDICATED single-worker
# executor: off the loop so N concurrent files' VADs never block the
# server's submit path, single-worker so they run serially on the
# one-core host — FIFO completion lets the first file's chunks reach
# the decode slots immediately instead of every VAD finishing late
# together (the default pool interleaves up to 5 on one core).
#
# The pool also keeps a PENDING count: while VADs are queued/running,
# more decode windows are at most seconds away, so the BatchServer
# defers dispatching a partially-filled bulk sweep (a partial sweep
# costs the same full fixed-shape program as a full one) and the
# staggered files coalesce into full batches.
_VAD_POOL = None
_VAD_PENDING = 0
_VAD_LOCK = None


def _vad_pool():
    global _VAD_POOL, _VAD_LOCK
    if _VAD_POOL is None:
        import threading
        from concurrent.futures import ThreadPoolExecutor

        _VAD_LOCK = threading.Lock()
        _VAD_POOL = ThreadPoolExecutor(max_workers=1,
                                       thread_name_prefix="ttasr-vad")
    return _VAD_POOL


def vad_pending() -> int:
    """Host VADs queued or running (see BatchServer's coalescing wait)."""
    return _VAD_PENDING


async def run_vad_async(audio_f32: np.ndarray, vad_opts) -> List[dict]:
    """``get_speech_timestamps`` in the serial VAD executor, with the
    pending count maintained for the server's bulk-coalescing wait."""
    global _VAD_PENDING
    pool = _vad_pool()
    with _VAD_LOCK:
        _VAD_PENDING += 1
    try:
        return await asyncio.get_running_loop().run_in_executor(
            pool, get_speech_timestamps, audio_f32, vad_opts)
    finally:
        with _VAD_LOCK:
            _VAD_PENDING -= 1


@dataclasses.dataclass
class TranscribeOptions:
    """Per-call knobs, defaults matching faster-whisper/reference usage."""

    language: Optional[str] = "zh"
    task: str = "transcribe"
    beam_size: int = 5
    best_of: int = 5
    patience: float = 1.0
    length_penalty: float = 1.0
    temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    compression_ratio_threshold: Optional[float] = 2.4
    log_prob_threshold: Optional[float] = -1.0
    no_speech_threshold: Optional[float] = 0.6
    condition_on_previous_text: bool = True
    prompt_reset_on_temperature: float = 0.5
    initial_prompt: Optional[str] = None
    prefix: Optional[str] = None
    without_timestamps: bool = False
    max_initial_timestamp: float = 1.0
    word_timestamps: bool = False
    vad_filter: bool = True
    vad_parameters: Optional[VadOptions] = None
    max_new_tokens: int = SAMPLE_LEN
    kv_cache_int8: Optional[bool] = None  # None -> engine default


def _host_f32(audio: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] view for HOST-side analysis (VAD, energy): int16
    masters stay int16 for the device upload (exact /32768 on device)."""
    if audio.dtype == np.int16:
        return audio.astype(np.float32) / 32768.0
    return audio


def _as_master(audio) -> np.ndarray:
    """Normalize caller audio: int16 passes through (device converts),
    anything else becomes mono float32."""
    a = np.asarray(audio)
    if a.ndim > 1:
        a = np.asarray(a, dtype=np.float32).mean(axis=0)
    if a.dtype != np.int16:
        a = np.asarray(a, dtype=np.float32)
    return a


def _parse_transcribe_kwargs(kwargs: dict) -> "TranscribeOptions":
    """faster-whisper-style kwargs -> TranscribeOptions: alias mapping,
    unknown-field tolerance, scalar-temperature normalization.  Shared
    by transcribe() and transcribe_with_server() so the two paths stay
    decode-equivalent."""
    known = {f.name for f in dataclasses.fields(TranscribeOptions)}
    fw_aliases = {"temperature": "temperatures"}
    clean_kwargs = {}
    for k, v in kwargs.items():
        k = fw_aliases.get(k, k)
        if k in known:
            clean_kwargs[k] = v
    opts = TranscribeOptions(**clean_kwargs)
    if isinstance(opts.temperatures, (int, float)):
        opts = dataclasses.replace(
            opts, temperatures=(float(opts.temperatures),))
    return opts


class WhisperEngine:
    """JAX Whisper inference engine with a faster-whisper-compatible API."""

    def __init__(self, model_path_or_name: str = "tiny", *,
                 compute_type: str = "float32",
                 tokenizer: Optional[WhisperTokenizer] = None,
                 params: Optional[Any] = None,
                 config: Optional[WhisperConfig] = None,
                 mesh: Optional[Any] = None,
                 cross_kv_int4: bool = True,
                 kv_int4: bool = True,
                 encoder_act_int8: bool = True,
                 encoder_fused_quant: bool = True):
        import jax.numpy as jnp

        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                 "float16": jnp.bfloat16, "int8": jnp.bfloat16}[compute_type]
        self.compute_type = compute_type
        self.device = "tpu"
        self.model_size = model_path_or_name
        self.mesh = mesh
        if params is not None and config is not None:
            self.params, self.cfg = params, config
        else:
            self.params, self.cfg = load_whisper(model_path_or_name, dtype=dtype)
        # int8 compute: quantized HBM-resident weights + int8 self-KV cache
        self.kv_cache_int8 = compute_type == "int8"
        # int4 nibble-packed cross-KV (default on): halves the dominant
        # per-step decode HBM stream again on the fused-kernel path;
        # recognition-level divergence vs the unfused int8 path measured
        # exact (tools/check_beam_divergence.py --cross-int4, PERF_NOTES)
        self.cross_kv_int4 = cross_kv_int4 and self.kv_cache_int8
        # int4 LANE-packed self-KV (default on): the batch-48 profile
        # converts cache bytes ~1:1 into step time and the int8 self-KV
        # is its largest term (VERDICT r4 #2); falls back to int8
        # automatically off the fused flat-kernel path (decode.
        # _use_self_int4).  A/B in PERF_NOTES round 5.
        self.kv_int4 = kv_int4 and self.kv_cache_int8
        self._tp = None
        if compute_type == "int8":
            from ttasr.ops.quant import fuse_qkv, quantize_params

            self.params = quantize_params(self.params)
            if mesh is None:
                self.params = fuse_qkv(self.params)
            else:
                # Mesh + int8: the fused Pallas kernels keep running —
                # per-shard inside shard_map with heads split over the
                # "model" axis (ttasr.parallel.tp; a pallas_call has no
                # GSPMD sharding rule, so pjit alone would replicate it).
                # Shapes that don't qualify (head_dim != 64, indivisible
                # heads) fall back to the unfused GSPMD int8 graph.
                from ttasr.parallel.tp import TPDecoder, tp_eligible

                if tp_eligible(self.params, self.cfg, mesh):
                    self._tp = TPDecoder(self.params, self.cfg, mesh)
        if mesh is not None:
            # Tensor-parallel serving: Megatron column/row-split specs over
            # the mesh "model" axis (SURVEY.md §2.3 "Required for
            # whisper-large-v3").  jit then compiles every decode program
            # against the sharded layouts and XLA inserts the ICI
            # collectives — no per-call mesh context is needed because the
            # NamedShardings are attached to the params themselves.
            from ttasr.parallel.sharding import shard_params

            self.params = shard_params(self.params, mesh)
        import jax as _jax

        _cfg = self.cfg

        # s8 x s8 encoder block matmuls (auto: engages when the weights
        # are int8-quantized and the merged attention kernel is active;
        # 2x the bf16 MXU rate on v5e).  encoder_act_int8=False forces
        # bf16 compute on quantized weights.
        _act8 = None if encoder_act_int8 else False
        # one-pass Pallas producer+quantize kernels on the act8 path
        # (ln_quant / add_ln_quant / gelu_quant / quant_only — VERDICT
        # r4 #4); False keeps the XLA quantize chains for A/B
        _fq = None if encoder_fused_quant else False

        def _mel_encode(params, audio):
            # callers pad host-side to the window length (30 s, or a
            # short streaming bucket — encode_windows), so the device
            # program takes the audio length as-is: one compiled
            # mel+encode per window bucket, S = samples/320 positions
            mel = log_mel_spectrogram(audio, n_mels=_cfg.num_mel_bins,
                                      pad_to_chunk=False)
            return encode(params, _cfg, mel, act_int8=_act8,
                          fused_quant=_fq)

        # ONE jitted program per batch size: calling the 32-layer encoder
        # eagerly costs hundreds of per-op dispatches through the axon
        # relay (~6 s per batch measured) — only whole-graph jit is fast
        self._mel_encode = _jax.jit(_mel_encode)
        self.tokenizer = tokenizer or load_tokenizer(
            model_path_or_name if isinstance(model_path_or_name, str) else None
        )
        self.ti = TokenizerInfo.from_tokenizer(
            self.tokenizer, n_vocab=self.cfg.vocab_size
        )
        self._rng_counter = 0


    def encode_windows(self, audio: np.ndarray, *,
                       window_samples: Optional[int] = None):
        """(B, <=window) or (<=window,) f32 audio -> encoder states.

        Pads host-side to ``window_samples`` (default the fixed 30 s
        window), then runs mel + encoder as one jitted program (eager
        per-op dispatch through the remote relay measured ~6 s per call;
        jitted it is ~0.1 s/window).

        ``window_samples`` < 30 s encodes a PREFIX of the window
        (S = samples/320 positions, positional embeddings sliced):
        streaming partials pay ~S/1500 of the encoder and
        S-proportional per-step cross-attention.  Each distinct value is
        its own compiled program — callers bucket it
        (ttasr.engine.serving.window_bucket).

        int16 input is uploaded as-is and converted on device — half the
        host->device bytes (the relay upload dominates the mel+encode
        call, PERF_NOTES.md)."""
        w = N_SAMPLES if window_samples is None else int(window_samples)
        a = np.asarray(audio)
        if a.dtype != np.int16:
            a = a.astype(np.float32, copy=False)
        squeeze = a.ndim == 1
        if squeeze:
            a = a[None]
        if a.shape[-1] < w:
            a = np.pad(a, ((0, 0), (0, w - a.shape[-1])))
        elif a.shape[-1] > w:
            a = a[..., :w]
        out = self._mel_encode(self.params, a)
        return out[0] if squeeze else out

    # -- low-level window decode ------------------------------------------

    def run_beam_decode(self, enc_out, prompt, pad, rng, opts: DecodingOptions):
        """Dispatch a beam decode: the shard_map fused TP path under a
        qualifying mesh, else the module-level (single-chip fused or
        GSPMD unfused) program.  Shared by the sequential seek loop and
        the BatchServer so every serving path stays decode-equivalent."""
        if self._tp is not None:
            return self._tp.beam(enc_out, prompt, pad, rng,
                                 opts=opts, ti=self.ti)
        return beam_decode(self.params, self.cfg, enc_out, prompt, pad, rng,
                           opts=opts, ti=self.ti)

    def run_greedy_decode(self, enc_out, prompt, pad, rng, temperature,
                          opts: DecodingOptions):
        """Greedy/sampled counterpart of :meth:`run_beam_decode`
        (temperature may be scalar or per-row)."""
        if self._tp is not None:
            return self._tp.greedy(enc_out, prompt, pad, rng, temperature,
                                   opts=opts, ti=self.ti)
        return greedy_decode(self.params, self.cfg, enc_out, prompt, pad,
                             rng, temperature, opts=opts, ti=self.ti)

    def _decode_window(self, enc_out, prompt_ids: List[int],
                       opts: TranscribeOptions, temperature: float):
        import jax

        self._rng_counter += 1
        rng = jax.random.PRNGKey(self._rng_counter)
        prompt, pad = pad_prompts([prompt_ids], self.ti.eot)
        kv_int8 = opts.kv_cache_int8
        if kv_int8 is None:
            kv_int8 = self.kv_cache_int8
        dec_opts = DecodingOptions(
            beam_size=opts.beam_size,
            length_penalty=opts.length_penalty,
            patience=opts.patience,
            without_timestamps=opts.without_timestamps,
            max_initial_timestamp=opts.max_initial_timestamp,
            sample_len=min(opts.max_new_tokens, SAMPLE_LEN),
            kv_int8=kv_int8,
            # int8 cross-KV rides the fused attnout+cross kernel: equal
            # speed to bf16 end-to-end and half the cross-cache HBM
            cross_kv_int8=kv_int8 and self.compute_type == "int8",
            cross_kv_int4=self.cross_kv_int4 and kv_int8,
            kv_int4=self.kv_int4 and kv_int8,
        )
        if temperature == 0.0 and opts.beam_size > 1:
            out = self.run_beam_decode(enc_out, prompt, pad, rng,
                                       opts=dec_opts)
            pick = 0
        elif temperature > 0.0 and opts.best_of > 1:
            # best_of candidates as ONE batched decode (faster-whisper
            # num_hypotheses=best_of at temperature>0): K independent
            # samples ride the batch axis of a single compiled program,
            # then MaximumLikelihoodRanker picks the winner on host.
            import jax.numpy as jnp

            k = opts.best_of
            enc_rep = jnp.broadcast_to(
                enc_out, (k,) + tuple(enc_out.shape[1:])
            )
            prompt_k = np.repeat(np.asarray(prompt), k, axis=0)
            pad_k = np.repeat(np.asarray(pad), k, axis=0)
            out = self.run_greedy_decode(enc_rep, prompt_k, pad_k, rng,
                                         temperature, opts=dec_opts)
            lengths = np.asarray(out["lengths"])
            sums = np.asarray(out["sum_logprob"])
            # GoogleNMT length penalty, openai MaximumLikelihoodRanker
            penalties = ((5.0 + lengths + 1.0) / 6.0) ** opts.length_penalty
            pick = int(np.argmax(sums / np.maximum(penalties, 1e-9)))
        else:
            # temperature is traced: the whole fallback ladder shares one
            # compiled greedy program
            out = self.run_greedy_decode(enc_out, prompt, pad, rng,
                                         temperature, opts=dec_opts)
            pick = 0
        n = int(out["lengths"][pick])
        tokens = [int(t) for t in np.asarray(out["tokens"])[pick, :n]]
        sum_logprob = float(out["sum_logprob"][pick])
        avg_logprob = sum_logprob / (n + 1) if n >= 0 else 0.0
        no_speech_prob = float(out["no_speech_prob"][pick])
        return tokens, avg_logprob, no_speech_prob

    @staticmethod
    def _needs_fallback(ratio: float, avg_logprob: float,
                        no_speech_prob: float,
                        opts: TranscribeOptions) -> bool:
        """Quality gates of faster-whisper generate_with_fallback —
        shared verbatim by the sequential and continuous-batching paths
        so both ladder identically."""
        needs_fallback = False
        if (opts.compression_ratio_threshold is not None
                and ratio > opts.compression_ratio_threshold):
            needs_fallback = True
        if (opts.log_prob_threshold is not None
                and avg_logprob < opts.log_prob_threshold):
            needs_fallback = True
        if (opts.no_speech_threshold is not None
                and no_speech_prob > opts.no_speech_threshold
                and opts.log_prob_threshold is not None
                and avg_logprob < opts.log_prob_threshold):
            needs_fallback = False  # silence: don't ladder up
        return needs_fallback

    def _decode_with_fallback(self, enc_out, prompt_ids, opts: TranscribeOptions):
        """Temperature ladder (faster-whisper generate_with_fallback)."""
        last = None
        for temperature in opts.temperatures:
            tokens, avg_logprob, no_speech_prob = self._decode_window(
                enc_out, prompt_ids, opts, temperature
            )
            text = self.tokenizer.decode(tokens)
            ratio = compression_ratio(text)
            last = (tokens, avg_logprob, no_speech_prob, ratio, temperature)
            if not self._needs_fallback(ratio, avg_logprob, no_speech_prob,
                                        opts):
                break
        return last

    # -- public API ----------------------------------------------------------

    def detect_language(self, audio: Union[str, np.ndarray]
                        ) -> Tuple[str, float, List[Tuple[str, float]]]:
        """Identify the spoken language from the first 30 s window.

        One decode step from ``<|startoftranscript|>`` with the
        distribution restricted to language tokens (openai-whisper
        ``detect_language``; part of the WhisperModel API surface).
        Returns (language, probability, all (language, prob) sorted).
        """
        import jax

        if isinstance(audio, (str, bytes)):
            audio, _ = load_audio(audio, sr=SAMPLE_RATE, int16=True)
        audio = _as_master(audio)[:N_SAMPLES]
        enc_out = self.encode_windows(audio[None])

        if not hasattr(self, "_lang_logits_fn"):
            from ttasr.models.whisper.decode import _logits_at, _prefill
            from ttasr.models.whisper.model import init_cache

            _cfg = self.cfg

            # one jitted program: eager prefill = a 32-layer teacher-
            # forced pass as hundreds of per-op relay dispatches
            def _lang_logits(params, enc_out, prompt, pad):
                cache = init_cache(params, _cfg, enc_out, max_len=17)
                hidden, _ = _prefill(params, _cfg, prompt, pad, cache)
                return _logits_at(params, hidden[:, -1])

            self._lang_logits_fn = jax.jit(_lang_logits)

        prompt, pad = pad_prompts([[self.tokenizer.sot]], self.ti.eot, width=16)
        logits = np.asarray(
            self._lang_logits_fn(self.params, enc_out, prompt, pad))[0]

        lang_ids = self.tokenizer.language_ids
        ids = np.asarray(list(lang_ids.values()))
        probs = np.exp(logits[ids] - logits[ids].max())
        probs = probs / probs.sum()
        ranked = sorted(
            zip(lang_ids.keys(), probs.tolist()), key=lambda kv: -kv[1]
        )
        return ranked[0][0], ranked[0][1], ranked

    def transcribe(self, audio: Union[str, np.ndarray], **kwargs
                   ) -> Tuple[List[Segment], TranscriptionInfo]:
        """Transcribe audio; returns (segments, info) like WhisperModel."""
        opts = _parse_transcribe_kwargs(kwargs)

        if isinstance(audio, (str, bytes)):
            # PCM16 sources stay int16: the device converts (exact
            # /32768), halving every window's host->device upload
            audio, _ = load_audio(audio, sr=SAMPLE_RATE, int16=True)
        audio = _as_master(audio)
        duration = len(audio) / SAMPLE_RATE

        language_probability = 1.0
        if opts.language is None and len(audio) > 0:
            # faster-whisper auto-detects from the first window
            lang, language_probability, _ = self.detect_language(audio)
            opts = dataclasses.replace(opts, language=lang)

        speech_chunks = None
        if opts.vad_filter:
            vad_opts = opts.vad_parameters or VadOptions()
            speech_chunks = get_speech_timestamps(_host_f32(audio), vad_opts)
            audio_vad = collect_chunks(audio, speech_chunks)
            duration_after_vad = len(audio_vad) / SAMPLE_RATE
            audio = audio_vad
        else:
            duration_after_vad = duration

        info = TranscriptionInfo(
            language=opts.language or "zh",
            language_probability=language_probability,
            duration=duration,
            duration_after_vad=duration_after_vad,
        )
        if len(audio) == 0:
            return [], info

        segments = self._transcribe_windows(audio, opts)

        if speech_chunks is not None and segments:
            ts_map = SpeechTimestampsMap(speech_chunks, SAMPLE_RATE)
            for seg in segments:
                seg.start = ts_map.get_original_time(seg.start)
                seg.end = ts_map.get_original_time(seg.end)
        return segments, info

    # -- continuous-batching path ---------------------------------------------

    async def _decode_with_fallback_server(self, server, window, prompt_ids,
                                           opts: TranscribeOptions,
                                           return_enc: bool):
        """Async mirror of :meth:`_decode_with_fallback` routed through a
        :class:`ttasr.engine.serving.BatchServer` — identical temperature
        ladder, quality gates, and best_of candidate selection, with each
        window decode packed into the server's shared slots."""
        import asyncio

        kv_int8 = opts.kv_cache_int8
        if kv_int8 is None:
            kv_int8 = self.kv_cache_int8
        dec_opts = DecodingOptions(
            beam_size=opts.beam_size,
            length_penalty=opts.length_penalty,
            patience=opts.patience,
            without_timestamps=opts.without_timestamps,
            max_initial_timestamp=opts.max_initial_timestamp,
            sample_len=min(opts.max_new_tokens, SAMPLE_LEN),
            kv_int8=kv_int8,
            # int8 cross-KV rides the fused attnout+cross kernel: equal
            # speed to bf16 end-to-end and half the cross-cache HBM
            cross_kv_int8=kv_int8 and self.compute_type == "int8",
            cross_kv_int4=self.cross_kv_int4 and kv_int8,
            kv_int4=self.kv_int4 and kv_int8,
        )
        last = None
        for temperature in opts.temperatures:
            if temperature > 0.0 and opts.best_of > 1:
                # best_of candidates as K parallel window requests: they
                # pack into the server's slots (often the same batch)
                results = await asyncio.gather(*[
                    server.transcribe_window(
                        window, prompt_ids, temperature=temperature,
                        opts=dec_opts, return_enc=return_enc,
                    )
                    for _ in range(opts.best_of)
                ])
                lengths = np.asarray([len(r.tokens) for r in results])
                sums = np.asarray([r.sum_logprob for r in results])
                penalties = (
                    (5.0 + lengths + 1.0) / 6.0
                ) ** opts.length_penalty
                result = results[int(np.argmax(
                    sums / np.maximum(penalties, 1e-9)))]
            else:
                result = await server.transcribe_window(
                    window, prompt_ids, temperature=temperature,
                    opts=dec_opts, return_enc=return_enc,
                )
            text = self.tokenizer.decode(result.tokens)
            ratio = compression_ratio(text)
            last = (result, ratio, temperature)
            if not self._needs_fallback(ratio, result.avg_logprob,
                                        result.no_speech_prob, opts):
                break
        return last

    async def transcribe_with_server(self, audio: Union[str, np.ndarray],
                                     server, **kwargs
                                     ) -> Tuple[List[Segment], TranscriptionInfo]:
        """Seek-loop transcription with window decodes routed through a
        :class:`ttasr.engine.serving.BatchServer` — windows from many
        concurrent files pack into shared fixed decode slots ("continuous
        batching of 30 s windows", BASELINE.json north star).

        Decode-equivalent to :meth:`transcribe`: the same temperature
        fallback ladder (with best_of sampling), no-speech gating,
        ``prompt_reset_on_temperature``, and word-timestamp alignment run
        per window; only the batching transport differs.  Prompt carry
        (``condition_on_previous_text``) stays sequential within a file;
        parallelism comes from running many files at once (see
        :func:`ttasr.engine.serving.transcribe_files`).
        """
        opts = _parse_transcribe_kwargs(kwargs)
        if isinstance(audio, (str, bytes)):
            audio, _ = load_audio(audio, sr=SAMPLE_RATE, int16=True)
        audio = _as_master(audio)
        duration = len(audio) / SAMPLE_RATE

        speech_chunks = None
        duration_after_vad = duration
        if opts.vad_filter:
            # host VAD in the dedicated serial executor (run_vad_async):
            # off the event loop so it never blocks the server's submit
            # path, serial so the one-core host finishes VADs FIFO
            vad_opts = opts.vad_parameters or VadOptions()
            speech_chunks = await run_vad_async(_host_f32(audio), vad_opts)
            audio = collect_chunks(audio, speech_chunks)
            duration_after_vad = len(audio) / SAMPLE_RATE

        info = TranscriptionInfo(
            language=opts.language or "zh", language_probability=1.0,
            duration=duration, duration_after_vad=duration_after_vad,
        )
        if len(audio) == 0:
            return [], info

        tok = self.tokenizer
        content_frames = max(len(audio) // HOP_LENGTH, 1)
        seek = 0
        all_tokens: List[int] = []
        prompt_reset_since = 0
        initial_prompt_tokens: List[int] = []
        if opts.initial_prompt:
            initial_prompt_tokens = tok.encode(" " + opts.initial_prompt.strip())
            all_tokens.extend(initial_prompt_tokens)
        segments: List[Segment] = []
        seg_id = 0

        # session scope: lets the server wave-coalesce partial
        # bulk sweeps across concurrent prompt-carry files
        with server.session():
            while seek < content_frames:
                time_offset = seek * HOP_LENGTH / SAMPLE_RATE
                window = audio[seek * HOP_LENGTH : seek * HOP_LENGTH + N_SAMPLES]
                segment_frames = min(N_FRAMES, content_frames - seek)
                segment_duration = segment_frames * HOP_LENGTH / SAMPLE_RATE

                previous = (all_tokens[prompt_reset_since:]
                            if opts.condition_on_previous_text else [])
                prompt_ids = build_prompt(
                    tok, language=opts.language or "zh", task=opts.task,
                    without_timestamps=opts.without_timestamps,
                    prefix_tokens=(tok.encode(" " + opts.prefix.strip())
                                   if opts.prefix else ()),
                    previous_tokens=previous,
                    initial_prompt_tokens=() if previous else initial_prompt_tokens,
                )
                result, ratio, temperature = await self._decode_with_fallback_server(
                    server, window, prompt_ids, opts,
                    return_enc=opts.word_timestamps,
                )
                tokens = result.tokens
                avg_logprob = result.avg_logprob
                no_speech_prob = result.no_speech_prob

                if (opts.no_speech_threshold is not None
                        and no_speech_prob > opts.no_speech_threshold):
                    should_skip = True
                    if (opts.log_prob_threshold is not None
                            and avg_logprob > opts.log_prob_threshold):
                        should_skip = False  # confident despite no_speech
                    if should_skip:
                        seek += segment_frames
                        continue

                new_segments, seek_advance = self._parse_window_tokens(
                    tokens, time_offset, segment_duration, segment_frames
                )
                window_words = None
                if opts.word_timestamps and any(s[0] for s in new_segments):
                    window_words = self._align_window_words(
                        [t for s in new_segments for t in s[0]], result.enc,
                        time_offset,
                    )
                for s_tokens, s_start, s_end in new_segments:
                    text = tok.decode(s_tokens)
                    if not text.strip():
                        continue
                    seg_words = None
                    if window_words is not None:
                        seg_words = [
                            w for w in window_words
                            if s_start - 0.01 <= (w.start + w.end) / 2 <= s_end + 0.5
                        ]
                    segments.append(Segment(
                        id=seg_id, seek=seek, start=s_start, end=s_end, text=text,
                        tokens=s_tokens, avg_logprob=avg_logprob,
                        compression_ratio=ratio, no_speech_prob=no_speech_prob,
                        temperature=temperature, words=seg_words,
                    ))
                    seg_id += 1
                    all_tokens.extend(s_tokens)

                if temperature > opts.prompt_reset_on_temperature:
                    prompt_reset_since = len(all_tokens)

                seek += seek_advance

        if speech_chunks is not None and segments:
            ts_map = SpeechTimestampsMap(speech_chunks, SAMPLE_RATE)
            for seg in segments:
                seg.start = ts_map.get_original_time(seg.start)
                seg.end = ts_map.get_original_time(seg.end)
        return segments, info


    # -- seek loop ------------------------------------------------------------

    def _transcribe_windows(self, audio: np.ndarray,
                            opts: TranscribeOptions) -> List[Segment]:
        tok = self.tokenizer
        content_frames = max(len(audio) // HOP_LENGTH, 1)
        seek = 0
        all_tokens: List[int] = []
        prompt_reset_since = 0
        initial_prompt_tokens: List[int] = []
        if opts.initial_prompt:
            initial_prompt_tokens = tok.encode(" " + opts.initial_prompt.strip())
            all_tokens.extend(initial_prompt_tokens)
        segments: List[Segment] = []
        seg_id = 0

        while seek < content_frames:
            time_offset = seek * HOP_LENGTH / SAMPLE_RATE
            window = audio[seek * HOP_LENGTH : seek * HOP_LENGTH + N_SAMPLES]
            segment_frames = min(N_FRAMES, content_frames - seek)
            segment_duration = segment_frames * HOP_LENGTH / SAMPLE_RATE

            enc_out = self.encode_windows(window[None])

            previous = all_tokens[prompt_reset_since:] if opts.condition_on_previous_text else []
            prompt_ids = build_prompt(
                tok,
                language=opts.language or "zh",
                task=opts.task,
                without_timestamps=opts.without_timestamps,
                prefix_tokens=tok.encode(" " + opts.prefix.strip()) if opts.prefix else (),
                previous_tokens=previous,
                initial_prompt_tokens=() if previous else initial_prompt_tokens,
            )

            tokens, avg_logprob, no_speech_prob, ratio, temperature = (
                self._decode_with_fallback(enc_out, prompt_ids, opts)
            )

            if (opts.no_speech_threshold is not None
                    and no_speech_prob > opts.no_speech_threshold):
                should_skip = True
                if (opts.log_prob_threshold is not None
                        and avg_logprob > opts.log_prob_threshold):
                    should_skip = False  # confident despite no_speech
                if should_skip:
                    seek += segment_frames
                    continue

            new_segments, seek_advance = self._parse_window_tokens(
                tokens, time_offset, segment_duration, segment_frames
            )
            window_words = None
            if opts.word_timestamps and any(s[0] for s in new_segments):
                window_words = self._align_window_words(
                    [t for s in new_segments for t in s[0]], enc_out, time_offset
                )
            for s_tokens, s_start, s_end in new_segments:
                text = tok.decode(s_tokens)
                if not text.strip():
                    continue
                seg_words = None
                if window_words is not None:
                    seg_words = [
                        w for w in window_words
                        if s_start - 0.01 <= (w.start + w.end) / 2 <= s_end + 0.5
                    ]
                segments.append(Segment(
                    id=seg_id, seek=seek, start=s_start, end=s_end, text=text,
                    tokens=s_tokens, avg_logprob=avg_logprob,
                    compression_ratio=ratio, no_speech_prob=no_speech_prob,
                    temperature=temperature, words=seg_words,
                ))
                seg_id += 1
                all_tokens.extend(s_tokens)

            if temperature > opts.prompt_reset_on_temperature:
                prompt_reset_since = len(all_tokens)

            seek += seek_advance

        return segments

    def _align_window_words(self, text_tokens: List[int], enc_out,
                            time_offset: float):
        """Cross-attention DTW word timestamps for one window."""
        from ttasr.engine.results import Word
        from ttasr.models.whisper.align import align_tokens, merge_tokens_to_words

        try:
            timings = align_tokens(
                self.params, self.cfg, self.tokenizer, text_tokens, enc_out
            )
            words = merge_tokens_to_words(self.tokenizer, timings)
        except Exception:
            logger.exception("word alignment failed; words omitted")
            return []
        return [
            Word(start=w["start"] + time_offset, end=w["end"] + time_offset,
                 word=w["word"])
            for w in words
        ]

    def _parse_window_tokens(self, tokens: List[int], time_offset: float,
                             segment_duration: float, segment_frames: int):
        """Split decoded tokens into timestamped segments; compute seek
        advance (openai-whisper seek rules)."""
        tok = self.tokenizer
        ts0 = tok.timestamp_begin

        if not tokens:
            return [], segment_frames

        is_ts = [tok.is_timestamp(t) for t in tokens]
        consecutive = [
            i + 1
            for i in range(len(tokens) - 1)
            if is_ts[i] and is_ts[i + 1]
        ]
        new_segments = []
        if consecutive:
            last_slice = 0
            for boundary in consecutive:
                sliced = tokens[last_slice:boundary]
                start_ts = sliced[0] - ts0
                end_ts = sliced[-1] - ts0
                new_segments.append((
                    [t for t in sliced if not tok.is_timestamp(t)],
                    time_offset + start_ts * TIME_PRECISION,
                    time_offset + end_ts * TIME_PRECISION,
                ))
                last_slice = boundary
            # seek to the last consecutive timestamp
            last_ts = tokens[last_slice - 1] - ts0
            seek_advance = last_ts * 2  # ts units are 0.02s = 2 frames
        else:
            # single segment covering the window; end at the last timestamp
            # if present, else the window duration
            duration = segment_duration
            ts_tokens = [t - ts0 for t in tokens if tok.is_timestamp(t)]
            if ts_tokens and ts_tokens[-1] != 0:
                duration = ts_tokens[-1] * TIME_PRECISION
            new_segments.append((
                [t for t in tokens if not tok.is_timestamp(t)],
                time_offset,
                time_offset + duration,
            ))
            seek_advance = segment_frames

        if not self.tokenizer.is_timestamp(tokens[0]) and not any(is_ts):
            # no timestamps at all (without_timestamps mode)
            new_segments = [(
                [t for t in tokens if not tok.is_timestamp(t)],
                time_offset,
                time_offset + segment_duration,
            )]
            seek_advance = segment_frames
        seek_advance = max(int(seek_advance), 1)
        return new_segments, seek_advance
