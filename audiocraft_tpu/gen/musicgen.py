"""MusicGen generation facade: text / melody / continuation / unlimited length.

Python orchestration over jitted device functions, re-designing
``/root/reference/audiocraft/models/genmodel.py`` (BaseGenModel) and
``/root/reference/audiocraft/models/musicgen.py`` (MusicGen):
* ``_prepare_tokens_and_attributes`` (musicgen.py:368-424): build
  ConditioningAttributes (text + self_wav melody), encode audio prompts to
  tokens via the codec.
* ``_generate_tokens`` (musicgen.py:426-518): single-window generation, or the
  stride-extension loop beyond ``max_duration`` with periodic melody-wav
  re-windowing (``positions % wav_length``, musicgen.py:493-502).
* CFG condition preparation (lm.py:489-509): conditional + null conditions
  tokenized and embedded together, batch-concatenated.

Device work (codec encode/decode, LM decode loop) is jitted; everything here
is host-side control flow with static shapes per (batch, duration) bucket.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.encodec import EncodecModel
from ..cond.attributes import (ClassifierFreeGuidanceDropout,
                               ConditioningAttributes, WavCondition)
from ..cond.conditioners import ConditioningProvider
from ..io.audio_utils import convert_audio
from ..lm.model import LMModel

MelodyList = tp.List[tp.Optional[np.ndarray]]


@dataclasses.dataclass
class MusicGen:
    """Facade bundling codec + LM + conditioning params with generation state."""
    name: str
    compression_model: EncodecModel
    codec_params: dict
    lm: LMModel
    lm_params: dict
    condition_provider: ConditioningProvider
    cond_params: dict
    max_duration: float = 30.0

    # generation params (set_generation_params, musicgen.py:145-184)
    duration: float = 15.0
    extend_stride: float = 10.0
    use_sampling: bool = True
    top_k: int = 250
    top_p: float = 0.0
    temperature: float = 1.0
    cfg_coef: float = 3.0
    cfg_coef_beta: tp.Optional[float] = None
    two_step_cfg: bool = False
    # decode compute dtype: bf16 is measured faster on TPU at serving batch
    # (PERF.md round-2 decode table); None = fp32 (the parity dtype, used by
    # the direct-LM parity tests)
    decode_dtype: tp.Optional[str] = 'bfloat16'
    # long-form codec decode: token sequences beyond this many frames route
    # through codec/chunked.chunked_decode (sequential shifted windows) —
    # one monolithic XLA program for a 720 s decode peaks at ~33 GB of HBM
    # activations on a 15.75 GB chip (PERF.md round-2f).  3000 frames = 60 s
    # at 50 Hz, measured safe as one program; windows are 1500 frames.
    decode_chunk_frames: int = 3000
    # KV-cache storage dtype: 'int8' halves the decode step's dominant HBM
    # read at serving batch (PERF.md round-2f: KV bytes ~5x the int8 weight
    # bytes at B=32) at ~1 % attention-output noise; None stores the cache
    # in the decode compute dtype (the parity path)
    kv_dtype: tp.Optional[str] = None
    # bucketed KV-cache growth ('auto' | capacity list | None): the decode
    # scan runs in segments of doubling cache capacity so early steps stop
    # streaming a full-length, mostly-masked KV buffer from HBM — token-exact
    # (lm/model.py kv_buckets / nn/transformer.grow_cache); None keeps the
    # single full-capacity buffer (the parity path)
    kv_buckets: tp.Union[None, str, tp.Sequence[int]] = None

    _progress_callback: tp.Optional[tp.Callable[[float, str], None]] = None

    @property
    def frame_rate(self) -> float:
        return self.compression_model.frame_rate

    @property
    def sample_rate(self) -> int:
        return self.compression_model.sample_rate

    @property
    def audio_channels(self) -> int:
        return self.compression_model.channels

    def set_generation_params(self, use_sampling: bool = True, top_k: int = 250,
                              top_p: float = 0.0, temperature: float = 1.0,
                              duration: float = 30.0, cfg_coef: float = 3.0,
                              cfg_coef_beta: tp.Optional[float] = None,
                              two_step_cfg: bool = False,
                              extend_stride: float = 10.0,
                              rep_penalty: tp.Optional[float] = None):
        assert extend_stride < self.max_duration, \
            "Cannot stride by more than max generation duration."
        self.duration = duration
        self.extend_stride = extend_stride
        self.use_sampling = use_sampling
        self.top_k = top_k
        self.top_p = top_p
        self.temperature = temperature
        self.cfg_coef = cfg_coef
        self.cfg_coef_beta = cfg_coef_beta
        self.two_step_cfg = two_step_cfg

    def set_custom_progress_callback(self, cb) -> None:
        self._progress_callback = cb

    def quantize_lm_weights(self, mode: str = 'int8',
                            group_size: int = 128) -> None:
        """Weight-only quantization for the LM (PERF.md: decode is
        weight-streaming bound; int8 measured 982 vs 712 steps/s at
        MusicGen-small).  ``mode``: 'int8' (per-channel, near-lossless) or
        'int4' (per-input-group, packed — halves the streamed bytes again at
        coarser rounding).  One-way; embeddings/norms stay floating point and
        sampling-relevant logits keep fp32 accumulation."""
        from ..lm.quantize import quantize_lm_params
        self.lm_params = quantize_lm_params(self.lm_params, mode=mode,
                                            group_size=group_size)
        self.__dict__.pop('_gen_jit_cache', None)

    def optimize_for_serving(self, weight_mode: str = 'int8',
                             kv_dtype: tp.Optional[str] = 'int8') -> None:
        """Apply the measured-best single-chip serving recipe in one call
        (PERF.md): int8 weight-only LM quantization (decode is
        weight-streaming bound), int8 KV cache (convert-in-dot attention;
        10 s e2e generate 30.2x vs 26.5x aggregate realtime at B=2), and the
        bf16 decode/codec compute dtypes (already the facade defaults).
        One-way for the weights; fp32 parity paths remain available by
        constructing a fresh facade.  Also enables bucketed KV-cache growth
        (token-exact — cuts the mostly-masked early-step KV reads on long
        windows)."""
        self.quantize_lm_weights(mode=weight_mode)
        self.kv_dtype = kv_dtype
        self.kv_buckets = 'auto'
        self.__dict__.pop('_gen_jit_cache', None)

    def set_style_conditioner_params(self, eval_q: int = 3,
                                     excerpt_length: float = 3.0,
                                     ds_factor: tp.Optional[int] = None,
                                     encodec_n_q: tp.Optional[int] = None
                                     ) -> None:
        """Tune the style conditioner's bottleneck at inference (reference
        musicgen.py:185-209 / conditioners.py:970-985); rebuilds the provider
        entry since our configs are frozen."""
        from ..cond.style_cond import StyleConditioner
        updated = []
        found = False
        for name, cond in self.condition_provider.conditioners:
            if isinstance(cond, StyleConditioner):
                cond = cond.with_params(eval_q=eval_q,
                                        excerpt_length=excerpt_length,
                                        ds_factor=ds_factor,
                                        encodec_n_q=encodec_n_q)
                found = True
            updated.append((name, cond))
        if not found:
            raise RuntimeError(
                'set_style_conditioner_params requires a style model')
        self.condition_provider = dataclasses.replace(
            self.condition_provider, conditioners=tuple(updated))

    # ------------------------------------------------------------- prepare
    def _prepare_tokens_and_attributes(
            self, descriptions: tp.Sequence[tp.Optional[str]],
            prompt: tp.Optional[jax.Array],
            melody_wavs: tp.Optional[MelodyList] = None,
    ) -> tp.Tuple[tp.List[ConditioningAttributes], tp.Optional[jax.Array]]:
        attributes = [ConditioningAttributes(text={'description': d})
                      for d in descriptions]
        conditioner_names = [n for n, _ in self.condition_provider.conditioners]
        if 'self_wav' in conditioner_names:
            if melody_wavs is None:
                melody_wavs = [None] * len(descriptions)
            assert len(melody_wavs) == len(descriptions)
            for attr, melody in zip(attributes, melody_wavs):
                if melody is None:
                    attr.wav['self_wav'] = WavCondition(
                        np.zeros((1, 1, 1), np.float32), np.zeros(1, np.int64),
                        sample_rate=[self.sample_rate], path=[None])
                else:
                    attr.wav['self_wav'] = WavCondition(
                        np.asarray(melody)[None], np.asarray([melody.shape[-1]]),
                        sample_rate=[self.sample_rate], path=[None])
        elif melody_wavs is not None and any(m is not None for m in melody_wavs):
            raise RuntimeError("This model doesn't support melody conditioning. "
                               "Use the `melody` model.")

        if prompt is not None:
            assert len(descriptions) == prompt.shape[0], \
                "Prompt and nb. descriptions doesn't match"
            hop = int(self.sample_rate / self.frame_rate)
            if (prompt.shape[-1] > self.decode_chunk_frames * hop
                    and isinstance(self.compression_model, EncodecModel)):
                # long prompts would OOM as one encode program (same memory
                # wall as long decodes — PERF.md round-2f)
                from ..codec.chunked import chunked_encode
                prompt_tokens, scale = chunked_encode(
                    self.compression_model, self.codec_params, prompt,
                    chunk_frames=self.decode_chunk_frames // 2)
            else:
                prompt_tokens, scale = self._codec_fn('encode')(
                    self.codec_params, prompt)
            assert scale is None
        else:
            prompt_tokens = None
        return attributes, prompt_tokens

    def _codec_fn(self, which: str):
        """Shape-polymorphic jitted codec encode/decode (cached)."""
        cache = self.__dict__.setdefault('_codec_jit_cache', {})
        if which not in cache:
            model = self.compression_model
            if which == 'encode':
                cache[which] = jax.jit(lambda p, x: model.encode(p, x))
            else:
                cache[which] = jax.jit(lambda p, c: model.decode(p, c))
        return cache[which]

    def _cfg_condition_tensors(self, attributes: tp.List[ConditioningAttributes]):
        """CFG condition groups (lm.py:489-509):
        * 1-pass: [conditions; null];
        * double CFG (cfg_coef_beta): [conditions; text-dropped; null];
        * two-step: (conditions, null) as separate tensor dicts."""
        from ..cond.attributes import drop_description_condition
        null_conditions = ClassifierFreeGuidanceDropout(p=1.0)(attributes)
        if self.cfg_coef_beta is not None:
            wav_conditions = drop_description_condition(
                [a.copy() for a in attributes])
            all_conditions = list(attributes) + wav_conditions + null_conditions
            tokenized = self.condition_provider.tokenize(all_conditions)
            return self.condition_provider(self.cond_params, tokenized)
        if self.two_step_cfg:
            cond = self.condition_provider(
                self.cond_params, self.condition_provider.tokenize(attributes))
            null = self.condition_provider(
                self.cond_params,
                self.condition_provider.tokenize(null_conditions))
            return (cond, null)
        all_conditions = list(attributes) + null_conditions
        tokenized = self.condition_provider.tokenize(all_conditions)
        return self.condition_provider(self.cond_params, tokenized)

    # ------------------------------------------------------------ generate
    def generate_unconditional(self, num_samples: int, key: tp.Optional[jax.Array] = None,
                               progress: bool = False, return_tokens: bool = False):
        descriptions: tp.List[tp.Optional[str]] = [None] * num_samples
        attributes, _ = self._prepare_tokens_and_attributes(descriptions, None)
        tokens = self._generate_tokens(attributes, None, key, progress)
        return self._out(tokens, return_tokens)

    def generate(self, descriptions: tp.List[str], key: tp.Optional[jax.Array] = None,
                 progress: bool = False, return_tokens: bool = False):
        attributes, prompt_tokens = self._prepare_tokens_and_attributes(
            descriptions, None)
        assert prompt_tokens is None
        tokens = self._generate_tokens(attributes, None, key, progress)
        return self._out(tokens, return_tokens)

    def generate_with_chroma(self, descriptions: tp.List[str],
                             melody_wavs: tp.Union[MelodyList, np.ndarray],
                             melody_sample_rate: int,
                             key: tp.Optional[jax.Array] = None,
                             progress: bool = False, return_tokens: bool = False):
        """Text + melody conditioning (musicgen.py:243-280)."""
        if isinstance(melody_wavs, np.ndarray):
            if melody_wavs.ndim == 2:
                melody_wavs = melody_wavs[None]
            melody_wavs = list(melody_wavs)
        melody_wavs = [
            None if m is None else np.asarray(convert_audio(
                jnp.asarray(m), melody_sample_rate, self.sample_rate, 1))
            for m in melody_wavs]
        attributes, prompt_tokens = self._prepare_tokens_and_attributes(
            descriptions, None, melody_wavs=melody_wavs)
        tokens = self._generate_tokens(attributes, prompt_tokens, key, progress)
        return self._out(tokens, return_tokens)

    def generate_continuation(self, prompt: jax.Array, prompt_sample_rate: int,
                              descriptions: tp.Optional[tp.List[tp.Optional[str]]] = None,
                              melody_wavs: tp.Optional[MelodyList] = None,
                              melody_sample_rate: tp.Optional[int] = None,
                              key: tp.Optional[jax.Array] = None,
                              progress: bool = False, return_tokens: bool = False):
        """Audio-prompted continuation (genmodel.py:168-192 + fork's
        generate_with_all, musicgen.py:282-336)."""
        prompt = jnp.asarray(prompt)
        if prompt.ndim == 2:
            prompt = prompt[None]
        assert prompt.ndim == 3, "prompt should be [B, C, T]"
        prompt = convert_audio(prompt, prompt_sample_rate, self.sample_rate,
                               self.audio_channels)
        if descriptions is None:
            descriptions = [None] * prompt.shape[0]
        if melody_wavs is not None:
            melody_wavs = [
                None if m is None else np.asarray(convert_audio(
                    jnp.asarray(m), melody_sample_rate or prompt_sample_rate,
                    self.sample_rate, 1))
                for m in melody_wavs]
        attributes, prompt_tokens = self._prepare_tokens_and_attributes(
            descriptions, prompt, melody_wavs=melody_wavs)
        assert prompt_tokens is not None
        tokens = self._generate_tokens(attributes, prompt_tokens, key, progress)
        return self._out(tokens, return_tokens)

    # fork naming: generate_with_all == melody + prompt continuation
    generate_with_all = generate_continuation

    def _out(self, tokens: jax.Array, return_tokens: bool):
        audio = self.generate_audio(tokens)
        return (audio, tokens) if return_tokens else audio

    def generate_audio(self, gen_tokens: jax.Array) -> jax.Array:
        assert gen_tokens.ndim == 3
        if gen_tokens.shape[-1] > self.decode_chunk_frames:
            from ..codec.chunked import chunked_decode
            from ..codec.stereo import InterleaveStereoCompressionModel
            if isinstance(self.compression_model,
                          (EncodecModel, InterleaveStereoCompressionModel)):
                return chunked_decode(
                    self.compression_model, self.codec_params, gen_tokens,
                    chunk_frames=self.decode_chunk_frames // 2)
        return self._codec_fn('decode')(self.codec_params, gen_tokens)

    # ------------------------------------------------------- token engine
    def _lm_generate(self, attributes, prompt_tokens, key, max_gen_len):
        """One jit-compiled LM generation call.

        The whole decode (prefill + scan + pattern revert) compiles to a
        single XLA program, cached per (batch, prompt-length, max_gen_len,
        sampling-params) signature — critical on TPU where eager dispatch
        round-trips a remote compiler per op.
        """
        condition_tensors = self._cfg_condition_tensors(attributes)
        num_samples = len(attributes)
        prompt_len = 0 if prompt_tokens is None else prompt_tokens.shape[-1]
        decode_dtype = None
        if self.decode_dtype is not None and jax.default_backend() == 'tpu':
            decode_dtype = jnp.dtype(self.decode_dtype)
        kv_buckets = self.kv_buckets
        if kv_buckets is not None and kv_buckets != 'auto':
            kv_buckets = tuple(kv_buckets)
        sig = (num_samples, prompt_len, max_gen_len, self.use_sampling,
               self.temperature, self.top_k, self.top_p, self.cfg_coef,
               self.cfg_coef_beta, self.two_step_cfg, str(decode_dtype),
               self.kv_dtype, kv_buckets,
               isinstance(condition_tensors, tuple))
        cache = self.__dict__.setdefault('_gen_jit_cache', {})
        if sig not in cache:
            lm = self.lm
            use_sampling, temp = self.use_sampling, self.temperature
            top_k, top_p, cfg_coef = self.top_k, self.top_p, self.cfg_coef
            cfg_coef_beta, two_step = self.cfg_coef_beta, self.two_step_cfg
            kv_dtype = self.kv_dtype

            if prompt_len == 0:
                def fn(params, key, cond):
                    return lm.generate(
                        params, key, prompt=None, condition_tensors=cond,
                        num_samples=num_samples, max_gen_len=max_gen_len,
                        use_sampling=use_sampling, temp=temp, top_k=top_k,
                        top_p=top_p, cfg_coef=cfg_coef,
                        cfg_coef_beta=cfg_coef_beta, two_step_cfg=two_step,
                        compute_dtype=decode_dtype, kv_dtype=kv_dtype,
                        kv_buckets=kv_buckets)
            else:
                def fn(params, key, cond, prompt):
                    return lm.generate(
                        params, key, prompt=prompt, condition_tensors=cond,
                        num_samples=num_samples, max_gen_len=max_gen_len,
                        use_sampling=use_sampling, temp=temp, top_k=top_k,
                        top_p=top_p, cfg_coef=cfg_coef,
                        cfg_coef_beta=cfg_coef_beta, two_step_cfg=two_step,
                        compute_dtype=decode_dtype, kv_dtype=kv_dtype,
                        kv_buckets=kv_buckets)
            cache[sig] = jax.jit(fn)
        if prompt_len == 0:
            return cache[sig](self.lm_params, key, condition_tensors)
        return cache[sig](self.lm_params, key, condition_tensors, prompt_tokens)

    def _generate_tokens(self, attributes: tp.List[ConditioningAttributes],
                         prompt_tokens: tp.Optional[jax.Array],
                         key: tp.Optional[jax.Array] = None,
                         progress: bool = False) -> jax.Array:
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
        total_gen_len = int(self.duration * self.frame_rate)
        max_prompt_len = int(min(self.duration, self.max_duration)
                             * self.frame_rate)

        if prompt_tokens is not None and prompt_tokens.shape[-1] > max_prompt_len:
            # reference genmodel.py:129-133 asserts instead; raising keeps the
            # contract visible (silently continuing from mid-prompt audio
            # would be wrong)
            raise ValueError(
                f"Prompt is longer than audio to generate: prompt covers "
                f"{prompt_tokens.shape[-1]} frames but only {max_prompt_len} "
                f"frames fit the requested duration")

        def report(done: float):
            if progress:
                print(f'{done * self.duration: 6.2f} / {self.duration: 6.2f}',
                      end='\r')
            if self._progress_callback is not None:
                self._progress_callback(
                    done, f"Generated {done * self.duration: 6.2f}"
                          f"/{self.duration: 6.2f} seconds")

        if self.duration <= self.max_duration:
            tokens = self._lm_generate(attributes, prompt_tokens, key,
                                       total_gen_len)
            report(1.0)
            return tokens

        # stride-extension loop (musicgen.py:469-515)
        assert self.extend_stride is not None and self.extend_stride < self.max_duration
        all_tokens = []
        ref_wavs = [attr.wav.get('self_wav') for attr in attributes]
        if prompt_tokens is None:
            prompt_length = 0
        else:
            all_tokens.append(prompt_tokens)
            prompt_length = prompt_tokens.shape[-1]
        stride_tokens = int(self.frame_rate * self.extend_stride)
        current_gen_offset = 0

        while current_gen_offset + prompt_length < total_gen_len:
            time_offset = current_gen_offset / self.frame_rate
            chunk_duration = min(self.duration - time_offset, self.max_duration)
            max_gen_len = int(chunk_duration * self.frame_rate)
            # periodically re-window melody wavs so each chunk hears the right
            # section (musicgen.py:487-502)
            for attr, ref_wav in zip(attributes, ref_wavs):
                if ref_wav is None:
                    continue
                wav_length = int(ref_wav.length[0])
                if wav_length == 0:
                    continue
                initial_position = int(time_offset * self.sample_rate)
                wav_target_length = int(self.max_duration * self.sample_rate)
                positions = (initial_position
                             + np.arange(wav_target_length)) % wav_length
                attr.wav['self_wav'] = WavCondition(
                    ref_wav.wav[..., positions],
                    np.full_like(ref_wav.length, wav_target_length),
                    [self.sample_rate] * ref_wav.wav.shape[0], [None], [0.])
            key, sub = jax.random.split(key)
            gen_tokens = self._lm_generate(attributes, prompt_tokens, sub,
                                           max_gen_len)
            if prompt_tokens is None:
                all_tokens.append(gen_tokens)
            else:
                all_tokens.append(gen_tokens[:, :, prompt_tokens.shape[-1]:])
            prompt_tokens = gen_tokens[:, :, stride_tokens:]
            prompt_length = prompt_tokens.shape[-1]
            current_gen_offset += stride_tokens
            report(min(1.0, (current_gen_offset + prompt_length) / total_gen_len))

        return jnp.concatenate(all_tokens, axis=-1)


def get_debug_musicgen(key: tp.Optional[jax.Array] = None) -> MusicGen:
    """Debug MusicGen: tiny codec + tiny LM with a LUT text conditioner,
    mirroring the reference debug models (builders.py:257-335) wired through
    MusicGen.get_pretrained('debug') (musicgen.py:121-125)."""
    from ..builders import get_debug_compression_model
    from ..cond.conditioners import LUTConditioner
    from ..cond.fuser import ConditionFuser
    from ..patterns import DelayedPatternProvider

    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    codec = get_debug_compression_model(32000)
    codec_params = codec.init(k1)
    dim = 16
    provider = ConditioningProvider.from_dict({
        'description': LUTConditioner(n_bins=128, dim=dim, output_dim=dim,
                                      tokenizer='whitespace')})
    fuser = ConditionFuser.from_dict({'cross': ('description',)})
    lm = LMModel(pattern_provider=DelayedPatternProvider(4), fuser=fuser,
                 n_q=4, card=400, dim=dim, num_heads=4, num_layers=2,
                 cross_attention=True, causal=True, norm_first=False,
                 activation='relu')
    return MusicGen(name='debug', compression_model=codec,
                    codec_params=codec_params, lm=lm, lm_params=lm.init(k2),
                    condition_provider=provider, cond_params=provider.init(k3),
                    max_duration=30.0, duration=5.0)


def get_debug_melody_musicgen(key: tp.Optional[jax.Array] = None) -> MusicGen:
    """Debug melody-conditioned MusicGen: text via cross-attention, chroma via
    prefix (prepend) — the MusicGen-melody fusing layout."""
    from ..builders import get_debug_compression_model
    from ..cond.chroma_cond import ChromaConditioner
    from ..cond.conditioners import ConditioningProvider, LUTConditioner
    from ..cond.fuser import ConditionFuser
    from ..patterns import DelayedPatternProvider

    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    codec = get_debug_compression_model(32000)
    codec_params = codec.init(k1)
    dim = 16
    provider = ConditioningProvider.from_dict({
        'description': LUTConditioner(n_bins=128, dim=dim, output_dim=dim,
                                      tokenizer='whitespace'),
        'self_wav': ChromaConditioner(output_dim=dim, sample_rate=32000,
                                      n_chroma=4, radix2_exp=12, duration=5.0),
    })
    fuser = ConditionFuser.from_dict({'cross': ('description',),
                                      'prepend': ('self_wav',)})
    lm = LMModel(pattern_provider=DelayedPatternProvider(4), fuser=fuser,
                 n_q=4, card=400, dim=dim, num_heads=4, num_layers=2,
                 cross_attention=True, causal=True, norm_first=False,
                 activation='relu')
    return MusicGen(name='debug-melody', compression_model=codec,
                    codec_params=codec_params, lm=lm, lm_params=lm.init(k2),
                    condition_provider=provider, cond_params=provider.init(k3),
                    max_duration=30.0, duration=5.0)
