"""Frozen configuration tree for the TPU-native Glow-TTS framework.

Compatibility surface: the YAML schema of the reference implementation
(``/root/reference/Hyper_Parameters.yaml``, documented in its README).  A
reference hyper-parameter file loads unchanged via :func:`load_config`.

Unlike the reference — which re-parses the YAML at *import time* into a module
global in five different modules (``Modules.py:10-13``, ``Train.py:22-25``,
``Datasets.py:9-12`` …) — the config here is parsed once into an immutable
dataclass tree and passed explicitly.  Immutability matters on TPU: the config
participates in ``jax.jit`` static arguments and pjit partitioning decisions,
so it must be hashable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Tuple

import yaml


# ---------------------------------------------------------------------------
# Leaf sections
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SoundConfig:
    """Audio/DSP constants (reference ``Hyper_Parameters.yaml:1-13``)."""
    spectrogram_dim: int = 1025
    mel_dim: int = 80
    frame_length: int = 1024
    frame_shift: int = 256
    sample_rate: int = 24000
    mel_f_min: int = 125
    mel_f_max: int = 7600
    max_abs_mel: float = 4.0
    confidence_threshold: float = 0.6
    gaussian_smoothing_sigma: float = 0.0
    pitch_min: float = 100.0
    pitch_max: float = 500.0


@dataclass(frozen=True)
class PrenetConfig:
    kernel_size: int = 5
    dropout_rate: float = 0.5
    stacks: int = 3


@dataclass(frozen=True)
class AttentionConfig:
    heads: int = 2
    window_size: int = 4


@dataclass(frozen=True)
class TransformerConvConfig:
    kernel_size: int = 3
    calc_channels: int = 768


@dataclass(frozen=True)
class TransformerConfig:
    attention: AttentionConfig = field(default_factory=AttentionConfig)
    conv: TransformerConvConfig = field(default_factory=TransformerConvConfig)
    dropout_rate: float = 0.1
    stacks: int = 6


@dataclass(frozen=True)
class DurationPredictorConfig:
    kernel_size: int = 3
    channels: int = 256
    stacks: int = 2
    dropout_rate: float = 0.1


@dataclass(frozen=True)
class EncoderConfig:
    channels: int = 192
    embedding_tokens: int = 35
    prenet: PrenetConfig = field(default_factory=PrenetConfig)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    duration_predictor: DurationPredictorConfig = field(
        default_factory=DurationPredictorConfig)


@dataclass(frozen=True)
class WaveNetConfig:
    num_layers: int = 4
    kernel_size: int = 5
    dropout_rate: float = 0.05


@dataclass(frozen=True)
class AffineCouplingConfig:
    calc_channels: int = 192
    wavenet: WaveNetConfig = field(default_factory=WaveNetConfig)


@dataclass(frozen=True)
class DecoderConfig:
    stack: int = 12
    num_squeeze: int = 2
    num_split: int = 4
    affine_coupling: AffineCouplingConfig = field(
        default_factory=AffineCouplingConfig)
    # Initialise the invertible 1×1 mixing at IDENTITY instead of the
    # reference's random orthogonal (``Modules.py:718-725``).  With the
    # alignment curriculum (decoder frozen while the prior locks), a
    # random mixing projects the two frames of each squeeze pair
    # differently, and the single-Gaussian-per-token prior averages the
    # two phase distributions — measured: boundary placement inside pairs
    # becomes likelihood-free and MAS durations go odd against an
    # all-even corpus (92.6 % of alignment errors ±1 token).  Identity
    # mixing keeps the frozen featurisation phase-symmetric; the weight
    # is still fully learnable after release.
    identity_mixing_init: bool = False


@dataclass(frozen=True)
class GE2ELSTMConfig:
    sizes: int = 256
    stacks: int = 3


@dataclass(frozen=True)
class GE2EInferenceConfig:
    samples: int = 5
    slice_length: int = 64
    overlap_length: int = 32


@dataclass(frozen=True)
class GE2EConfig:
    lstm: GE2ELSTMConfig = field(default_factory=GE2ELSTMConfig)
    inference: GE2EInferenceConfig = field(default_factory=GE2EInferenceConfig)
    checkpoint_path: Optional[str] = None


@dataclass(frozen=True)
class SpeakerEmbeddingConfig:
    type: str = 'LUT'           # 'LUT' | 'GE2E'
    num_speakers: int = 109
    embedding_size: int = 256
    ge2e: GE2EConfig = field(default_factory=GE2EConfig)


@dataclass(frozen=True)
class ReferenceEncoderConvConfig:
    kernel_size: Tuple[int, ...] = (3, 3, 3, 3, 3, 3)
    channels: Tuple[int, ...] = (32, 32, 64, 64, 128, 128)
    strides: Tuple[int, ...] = (2, 2, 2, 2, 2, 2)


@dataclass(frozen=True)
class ReferenceEncoderGRUConfig:
    size: int = 128
    stacks: int = 1


@dataclass(frozen=True)
class ReferenceEncoderConfig:
    conv: ReferenceEncoderConvConfig = field(
        default_factory=ReferenceEncoderConvConfig)
    gru: ReferenceEncoderGRUConfig = field(
        default_factory=ReferenceEncoderGRUConfig)


@dataclass(frozen=True)
class StyleTokenConfig:
    num_tokens: int = 128
    size: int = 256
    attention_head: int = 4


@dataclass(frozen=True)
class ProsodyEncoderConfig:
    size: int = 256
    reference_encoder: ReferenceEncoderConfig = field(
        default_factory=ReferenceEncoderConfig)
    style_token: StyleTokenConfig = field(default_factory=StyleTokenConfig)


@dataclass(frozen=True)
class SpeakerClassifierConfig:
    channels: Tuple[int, ...] = (256,)


@dataclass(frozen=True)
class PatternConfig:
    path: str = './patterns/Train'
    metadata_file: str = 'METADATA.PICKLE'
    mel_length_min: int = 50
    mel_length_max: int = 1000
    text_length_min: int = 10
    text_length_max: int = 200
    accumulated_dataset_epoch: int = 1


@dataclass(frozen=True)
class LearningRateConfig:
    initial: float = 1.0e-3
    base: int = 4000


@dataclass(frozen=True)
class AdamConfig:
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1.0e-6


@dataclass(frozen=True)
class TrainConfig:
    use_pattern_cache: bool = True
    train_pattern: PatternConfig = field(default_factory=PatternConfig)
    eval_pattern: PatternConfig = field(
        default_factory=lambda: PatternConfig(path='./patterns/Eval'))
    num_workers: int = 4
    adversarial_speaker_weight: float = 0.0005
    batch_size: int = 32
    learning_rate: LearningRateConfig = field(default_factory=LearningRateConfig)
    adam: AdamConfig = field(default_factory=AdamConfig)
    weight_decay: float = 1.0e-6
    gradient_norm: float = 5.0
    max_step: int = 400000
    checkpoint_save_interval: int = 1000
    logging_interval: int = 100
    evaluation_interval: int = 1000
    prosody_check_interval: int = 5000
    inference_interval: int = 1000
    initial_inference: bool = False
    inference_pattern_file_in_train: Optional[str] = None
    # Alignment curriculum: for the first N steps train against the uniform
    # left-to-right ("linear") alignment path instead of MAS, then release
    # to MAS.  0 (default) reproduces the reference exactly (MAS from step
    # 0, ``Modules.py:116``).  Rationale: the prior↔MAS EM loop can freeze
    # in a degenerate self-consistent fixed point from a cold start (an
    # untrained prior scores all monotonic paths equally), while the same
    # loop released from a roughly-correct path locks — measured in
    # docs/CONVERGENCE.md (EM from linear-path init reaches alignment
    # accuracy 0.9998 where the cold start stays at 0.054).
    alignment_warmup_steps: int = 0
    # Warmup path construction: 'linear' = uniform left-to-right;
    # 'anchored' = MAS over a silence-anchor + guided-diagonal surrogate
    # score (models/glow_tts.py:anchored_alignment_path).  'anchored'
    # pins the warmup path at pauses — at speech-realistic token
    # durations the linear path's cumulative boundary error (~½ token)
    # otherwise freezes into a self-consistent prior↔MAS fixed point
    # (measured: docs/CONVERGENCE.md round-4 study).
    # 'em' = closed-form per-token-ID Gaussian EM on stop_grad(z) from
    # the anchored init, with the network prior distilled onto the table
    # (models/glow_tts.py:em_alignment_path).  The round-4 measurement
    # behind it (benchmarks/diag_em_on_z.py): the table prior reaches MAS
    # accuracy 0.9984 where SGD leaves the network prior at 0.5336 on the
    # same z — the warmup runs that E/M pair inside the train step.
    alignment_warmup_mode: str = 'linear'
    # EMA decay of the EM sufficient statistics across steps ('em' mode):
    # effective pooling window 1/(1-decay) batches — 0.875 ≈ 8 batches,
    # recovering the probe's pooled-corpus fit from per-batch slices.
    em_stats_decay: float = 0.875
    # Weight of the masked-MSE distillation of the network prior's
    # (mean, log_std) onto the EM table ('em' mode; 0 disables).
    em_distill_weight: float = 1.0
    # Token ids treated as pauses by the anchored warmup (e.g. the space
    # token); empty → only the guided-diagonal term is used.
    anchor_pause_tokens: Tuple[int, ...] = ()
    # Frame channel-mean threshold (on the ±max_abs_mel scale) below
    # which a frame counts as silent for the anchored warmup.
    anchor_silence_level: float = -3.5
    # Freeze the flow decoder for the first N steps (0 = off).  Used with
    # the alignment warmup: the exact-likelihood flow otherwise whitens
    # the corpus faster than the prior can lock the alignment (the "race"
    # quantified in docs/CONVERGENCE.md — alignment reward 0.203 → 0.030
    # nats/dim within 3k steps).  With the decoder frozen, z is a fixed
    # featurisation and prior↔MAS runs as pure EM, which locks from a
    # linear-path init; release the decoder after the lock.
    decoder_freeze_steps: int = 0

    def __post_init__(self):
        # A typo'd mode (e.g. 'anchor', 'EM') would otherwise make the
        # trainer build warm-step variants with linear/anchored/em all
        # False — silently training the warmup steps with plain
        # learned-prior MAS, the exact cold-start failure the curriculum
        # exists to prevent (ADVICE r4).
        valid = ('linear', 'anchored', 'em')
        if self.alignment_warmup_mode not in valid:
            raise ValueError(
                f'Train.Alignment_Warmup_Mode must be one of {valid}, '
                f'got {self.alignment_warmup_mode!r}')


@dataclass(frozen=True)
class TPUConfig:
    """TPU-specific settings — no analogue in the reference (it is
    single-GPU, ``Train.py:27-35``).  These drive the ``jax.sharding.Mesh``
    layout and the compute precision policy.
    """
    # Data-parallel axis size; 0/None means "use all visible devices".
    data_parallel: int = 0
    # Mesh axis names (data, model).  model_parallel > 1 turns on tensor
    # parallelism: GSPMD partitioning of the attention/FFN/WaveNet matmuls
    # per the rules in parallel/tp.py (single-process only).
    mesh_axes: Tuple[str, str] = ('data', 'model')
    model_parallel: int = 1
    # bfloat16 activations on the MXU; fp32 for flow logdets and the loss.
    compute_dtype: str = 'bfloat16'
    param_dtype: str = 'float32'
    # Pad token/mel lengths up to multiples of these bucket sizes so XLA sees
    # a small, fixed set of shapes instead of one shape per batch.
    token_bucket: int = 32
    mel_bucket: int = 128
    # 'pallas' | 'scan' | 'cpp' | 'numpy' — monotonic alignment search backend.
    mas_backend: str = 'pallas'
    # Flow-decoder backend:
    # 'auto' → the fastest measured backend; 'flax' → plain XLA (with the
    # gather-free mixing matrix: 12-step decoder 4.9 ms @ batch 32 × 384
    # squeezed frames, v5e); 'fused' → the per-step Pallas flow-step
    # kernel (bf16 compute only, measured ~8 % behind XLA); 'mega' → the
    # 12-step flow-STACK megakernel (one pallas_call for the whole
    # decoder, activations VMEM-resident across steps, per-step weights
    # streamed by grid-block double-buffering; f32 inference runs the
    # in-kernel 3-pass dots).  Under 'mega', TRAINING also runs the
    # megakernel pair (forward with in-kernel hash dropout + the
    # hand-written Pallas backward, ops/coupling_grad.py; bf16 hardware
    # path).  '*_interpret' variants run the Pallas interpreter (CPU
    # parity tests).
    coupling_backend: str = 'auto'
    # XLA matmul precision: 'default' (fast, bf16-input MXU passes; mel MAE
    # vs the fp32 CPU reference ≈ 8e-3) or 'highest' (multi-pass fp32 on the
    # MXU; bit-level parity, slower).  Training uses 'default'.
    matmul_precision: str = 'default'
    # Inference-path precision policy (selective: training keeps the fast
    # bf16 policy above).  Measured on v5e (benchmarks/precision_sweep.py,
    # batch 32 × ~1k frames, vs the fp32 torch reference):
    #   bf16 act + 1-pass MXU: MAE 4.0e-2, 13.5 ms/batch
    #   f32 act  + 1-pass MXU: MAE 2.8e-2, 14.7 ms/batch
    #   f32 act  + 3-pass MXU: MAE 7.7e-5, 23.9 ms/batch   ← default
    #   f32 act  + 6-pass MXU: MAE 9.1e-6, 38.3 ms/batch
    # The default meets the MAE < 1e-3 north star 13× over while staying
    # ~280× the reference baseline throughput.  Set both to
    # 'bfloat16' / 'default' for maximum-speed synthesis.
    inference_dtype: str = 'float32'
    inference_matmul_precision: str = 'tensorfloat32'
    # Per-stage overrides of the inference matmul precision (None → use
    # inference_matmul_precision for both).  The error budget is not
    # uniform: the text encoder feeds durations through a ceil() (one
    # boundary flip shifts every following frame) and the prior statistics
    # enter z directly, while the flow decoder's error is attenuated
    # differently — benchmarks/precision_sweep.py --scoped measures the
    # attribution so the expensive multi-pass MXU mode is paid only where
    # the accuracy comes from.
    inference_encoder_matmul_precision: Optional[str] = None
    inference_decoder_matmul_precision: Optional[str] = None
    # Rematerialise each flow step on the backward pass (jax.checkpoint):
    # trades ~⅓ more FLOPs for O(stack) less activation memory — enables
    # much larger batch × sequence products per chip.
    remat_flows: bool = False
    # Checkpoint policy for remat_flows (name from jax.checkpoint_policies,
    # e.g. 'dots_saveable' / 'dots_with_no_batch_dims_saveable'); None =
    # save nothing per step (pure recompute).  The policy trades recompute
    # FLOPs against HBM round-trips of stored activations.  Measured on v5e
    # at batch 32 × 768 frames (benchmarks/exp_variants_r5.jsonl): every
    # remat flavour LOSES wall time there (27.2–30.5 vs 22.2 ms/step), so
    # remat stays what it was built for — fitting larger batch × length
    # products — with the policy knob to soften its cost when used.
    remat_policy: Optional[str] = None
    # Serving-path weight-norm folding: the coupling WaveNet's weight-normed
    # convs recompute g·v/‖v‖ on every dispatch (``Modules.py:766,818,825``
    # torch weight_norm).  With this flag the model expects PRE-FOLDED
    # kernels (v ← g·v/‖v‖, g dropped — apply
    # ``layers.fold_weight_norm_params`` to a trained checkpoint) and skips
    # the normalisation entirely.  Training must keep this False: the
    # g/‖v‖ decomposition is what gives weight norm its conditioning.
    # ``Inferencer`` enables it automatically at load.
    fold_weight_norm: bool = False

    def __post_init__(self):
        # A typo'd policy name would otherwise surface as an AttributeError
        # deep inside FlowDecoder.__call__ at trace time (ADVICE r4's
        # validate-enums-at-load rule).
        if self.remat_policy is not None:
            import jax
            if not hasattr(jax.checkpoint_policies, self.remat_policy):
                raise ValueError(
                    f'TPU.remat_policy {self.remat_policy!r} is not a '
                    f'jax.checkpoint_policies member')


@dataclass(frozen=True)
class Config:
    """Root configuration (schema of the reference ``Hyper_Parameters.yaml``)."""
    sound: SoundConfig = field(default_factory=SoundConfig)
    use_cython_alignment: bool = True   # kept for YAML compat; maps to mas_backend
    mode: str = 'Vanilla'               # 'Vanilla' | 'SE' | 'PE' | 'GR'
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    speaker_embedding: SpeakerEmbeddingConfig = field(
        default_factory=SpeakerEmbeddingConfig)
    prosody_encoder: ProsodyEncoderConfig = field(
        default_factory=ProsodyEncoderConfig)
    speaker_classifier_gr: SpeakerClassifierConfig = field(
        default_factory=SpeakerClassifierConfig)
    token_path: str = './Token.yaml'
    train: TrainConfig = field(default_factory=TrainConfig)
    inference_batch_size: Optional[int] = None
    inference_path: str = './results/Inference'
    checkpoint_path: str = './results/Checkpoint'
    log_path: str = './results/Log'
    use_mixed_precision: bool = False
    device: str = '0'
    tpu: TPUConfig = field(default_factory=TPUConfig)

    # -- derived properties used across the model ---------------------------

    @property
    def mode_upper(self) -> str:
        return self.mode.upper()

    @property
    def uses_speaker_embedding(self) -> bool:
        return self.mode_upper in ('SE', 'GR')

    @property
    def uses_prosody_encoder(self) -> bool:
        return self.mode_upper in ('PE', 'GR')

    @property
    def uses_gradient_reversal(self) -> bool:
        return self.mode_upper == 'GR'

    @property
    def condition_size(self) -> int:
        """Channel count of the conditioning vector fed to the duration
        predictor (reference ``Modules.py:583-590``)."""
        if self.mode_upper == 'SE':
            return self.speaker_embedding.embedding_size
        if self.mode_upper == 'PE':
            return self.prosody_encoder.size
        if self.mode_upper == 'GR':
            assert (self.speaker_embedding.embedding_size
                    == self.prosody_encoder.size), (
                'In GR mode the speaker embedding size and prosody encoder '
                'size must match.')
            return self.speaker_embedding.embedding_size
        return 0


# ---------------------------------------------------------------------------
# YAML loading (reference-schema compatible)
# ---------------------------------------------------------------------------

# Reference YAML keys are TitleCase_With_Underscores; dataclass fields are
# snake_case.  A handful of keys do not follow the mechanical rule.
_SPECIAL_KEYS = {
    'GE2E': 'ge2e',
    'LSTM': 'lstm',
    'GRU': 'gru',
    'ADAM': 'adam',
    'TPU': 'tpu',
    'Speaker_Classifier_GR': 'speaker_classifier_gr',
    'Mel_F_Min': 'mel_f_min',
    'Mel_F_Max': 'mel_f_max',
}


def _normalize_key(key: str) -> str:
    if key in _SPECIAL_KEYS:
        return _SPECIAL_KEYS[key]
    return key.lower()


def _coerce(cls: type, data: Any) -> Any:
    """Recursively build a dataclass of type ``cls`` from nested mappings."""
    if data is None:
        return cls()
    if not dataclasses.is_dataclass(cls):
        return data
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for raw_key, value in data.items():
        name = _normalize_key(raw_key)
        if name not in fields:
            # Nested min/max blocks in the reference pattern config
            # (``Mel_Length: {Min, Max}``) flatten to *_min / *_max fields.
            if isinstance(value, Mapping) and all(
                    f'{name}_{k.lower()}' in fields for k in value):
                for k, v in value.items():
                    kwargs[f'{name}_{k.lower()}'] = v
                continue
            continue  # unknown keys are ignored (forward compatibility)
        f = fields[name]
        ftype = f.type if isinstance(f.type, type) else _resolve_type(cls, f.name)
        if dataclasses.is_dataclass(ftype) and isinstance(value, Mapping):
            kwargs[name] = _coerce(ftype, value)
        elif isinstance(value, list):
            kwargs[name] = tuple(value)
        else:
            kwargs[name] = value
    return cls(**kwargs)


def _resolve_type(cls: type, field_name: str) -> type:
    import typing
    hints = typing.get_type_hints(cls)
    t = hints[field_name]
    origin = typing.get_origin(t)
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(t) if a is not type(None)]
        return args[0]
    return t


def load_config(path_or_dict) -> Config:
    """Load a :class:`Config` from a reference-format YAML file or a dict.

    Two reference keys have no direct field analogue on TPU and are mapped
    onto the ``TPU`` section when the YAML provides them (explicit ``TPU``
    keys always win):

    * ``Use_Cython_Alignment`` (``Hyper_Parameters.yaml:15``, dispatched at
      ``Modules.py:930-932``): ``true`` selects the native fast MAS path →
      ``tpu.mas_backend: pallas``; ``false`` selects the python fallback →
      ``tpu.mas_backend: scan``.
    * ``Use_Mixed_Precision`` (``Train.py:42-47`` apex AMP): ``true`` →
      bf16 compute (``tpu.compute_dtype: bfloat16``); ``false`` → full
      fp32 compute.
    """
    if isinstance(path_or_dict, Mapping):
        data = path_or_dict
    else:
        with open(path_or_dict, encoding='utf-8') as f:
            data = yaml.safe_load(f)
    config = _coerce(Config, data)

    tpu_section = data.get('TPU') or data.get('tpu') or {}
    replacements = {}
    if 'Use_Cython_Alignment' in data and 'mas_backend' not in tpu_section:
        replacements['mas_backend'] = (
            'pallas' if data['Use_Cython_Alignment'] else 'scan')
    if 'Use_Mixed_Precision' in data and 'compute_dtype' not in tpu_section:
        replacements['compute_dtype'] = (
            'bfloat16' if data['Use_Mixed_Precision'] else 'float32')
    if replacements:
        config = dataclasses.replace(
            config, tpu=dataclasses.replace(config.tpu, **replacements))
    return config


def save_config(config: Config, path: str) -> None:
    """Persist the config snapshot next to checkpoints (the reference copies
    the raw YAML instead, ``Train.py:564-568``)."""
    with open(path, 'w', encoding='utf-8') as f:
        yaml.safe_dump(dataclasses.asdict(config), f, sort_keys=False)
