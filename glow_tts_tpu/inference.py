"""Standalone inference driver (capability of reference ``Inference.py``).

``Inferencer`` loads a checkpoint (latest or exact step), synthesises mels
for programmatic requests or TSV files, and exports the PNG/NPY artifact
tree.  The reference stops at mels too — wav synthesis is delegated to an
external vocoder (``README.md:119-124``; SURVEY §2.31).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from glow_tts_tpu.config import Config, load_config
from glow_tts_tpu.data.collate import InferenceCollater
from glow_tts_tpu.data.patterns import InferenceDataset
from glow_tts_tpu.text import Tokenizer, load_token_dict, text_filtering
from glow_tts_tpu.training.checkpoint import CheckpointManager
from glow_tts_tpu.training.step import create_train_state
from glow_tts_tpu.utils.plotting import export_mel_figure, export_npy


class Inferencer:
    """``use_mesh=None`` (auto) shards serving batches over all local
    devices (data-parallel over a `jax.sharding.Mesh`) when more than one
    is visible — the reference serves on exactly one GPU
    (``Train.py:27-35``); here a single host drives a whole slice.

    Synthesis is two-phase and mel-bucketed: the prior phase predicts
    durations, then the decode phase runs in the smallest static mel
    bucket (default ladder: powers of two up to ``max_mel_length``) the
    batch fits, so short texts pay bucket-sized inverse-flow FLOPs
    instead of worst-case ones while XLA reuses one executable per
    bucket.  ``mel_buckets=()`` disables the ladder (always decode at
    ``max_mel_length``)."""

    def __init__(self, checkpoint_path: str,
                 config: Optional[Config] = None,
                 step: int = 0,
                 batch_size: Optional[int] = None,
                 max_mel_length: int = 1024,
                 use_mesh: Optional[bool] = None,
                 mel_buckets: Optional[Sequence[int]] = None):
        if config is None:
            snapshot = os.path.join(checkpoint_path, 'Hyper_Parameters.yaml')
            if not os.path.exists(snapshot):
                raise FileNotFoundError(
                    f'{checkpoint_path!r} is not a glow_tts_tpu checkpoint '
                    f'directory (no Hyper_Parameters.yaml snapshot found — '
                    f'pass config= explicitly to override)')
            config = load_config(snapshot)
        self.config = config
        self.batch_size = batch_size or config.inference_batch_size \
            or config.train.batch_size
        self.max_mel_length = max_mel_length

        token_dict = None
        if config.token_path and os.path.exists(config.token_path):
            token_dict = load_token_dict(config.token_path)
        self.tokenizer = Tokenizer(token_dict)
        self.collater = InferenceCollater(config, self.tokenizer)

        self.model, state = create_train_state(
            config, jax.random.PRNGKey(0),
            self._dummy_train_batch())
        restored = CheckpointManager(checkpoint_path).restore(state, step)
        if restored is None:
            raise FileNotFoundError(
                f'no checkpoint found in {checkpoint_path}')
        self.state, self.step = restored
        # Serving folds weight norm into the kernels ONCE at load
        # (v ← g·v/‖v‖) instead of recomputing it per dispatch as torch
        # ``weight_norm`` does (``Modules.py:766,818,825``); bit-identical
        # outputs (tests/test_model.py::test_weight_norm_fold_parity).
        import dataclasses
        from glow_tts_tpu.models.layers import fold_weight_norm_params
        from glow_tts_tpu.training.step import build_model
        fold_config = dataclasses.replace(
            config,
            tpu=dataclasses.replace(config.tpu, fold_weight_norm=True))
        self.state = self.state.replace(
            params=fold_weight_norm_params(self.state.params))

        # Two-phase bucketed serving (models/glow_tts.py): phase 1 sizes
        # the utterance from the predicted durations, phase 2 decodes in
        # the smallest static mel bucket that fits — a short text pays
        # bucket-sized inverse-flow FLOPs, not worst-case ones.  Default
        # ladder: powers of two up to max_mel_length.  Pass
        # ``mel_buckets=()`` to always decode at max_mel_length.
        from glow_tts_tpu.training.step import make_two_phase_inference
        s = config.decoder.num_squeeze
        if mel_buckets is None:
            mel_buckets, b = [], 128
            while b < max_mel_length:
                mel_buckets.append(b)
                b *= 2
        buckets = sorted({min(max(int(b) // s * s, s), max_mel_length)
                          for b in mel_buckets} | {max_mel_length})
        self.mel_buckets = buckets
        fold_model = build_model(fold_config)
        prior_step, decode_for = make_two_phase_inference(
            fold_config, fold_model)
        self._prior = jax.jit(prior_step)
        self._decode_for = decode_for
        self._decode_cache: Dict[int, object] = {}

        from glow_tts_tpu.parallel import mesh as mesh_lib
        self._mesh_lib = mesh_lib
        ndev = len(jax.devices())
        want_mesh = ndev > 1 if use_mesh is None else use_mesh
        self.mesh = None
        if want_mesh and ndev > 1:
            # honor TPU.model_parallel: serving runs on a (data, model)
            # mesh with tensor-parallel parameters (parallel/tp.py);
            # model_parallel == 1 → plain data-parallel replication
            model_par = max(fold_config.tpu.model_parallel, 1)
            mesh_cfg = dataclasses.replace(
                fold_config,
                tpu=dataclasses.replace(fold_config.tpu,
                                        data_parallel=ndev // model_par))
            self.mesh = mesh_lib.make_mesh(mesh_cfg)
            from glow_tts_tpu.parallel import tp
            self.state = tp.place_state(self.state, self.mesh)

    def _dummy_train_batch(self) -> Dict:
        cfg = self.config
        rng = np.random.default_rng(0)
        b, t_tok, t_mel = 2, 16, 32
        batch = {
            'tokens': rng.integers(0, cfg.encoder.embedding_tokens,
                                   (b, t_tok)).astype(np.int32),
            'token_lengths': np.full((b,), t_tok, np.int32),
            'mels': rng.standard_normal((b, t_mel, cfg.sound.mel_dim)
                                        ).astype(np.float32),
            'mel_lengths': np.full((b,), t_mel, np.int32),
        }
        if cfg.uses_speaker_embedding or cfg.uses_gradient_reversal:
            batch['speakers'] = np.zeros((b,), np.int32)
            if cfg.speaker_embedding.type.upper() == 'GE2E':
                ge2e = cfg.speaker_embedding.ge2e.inference
                batch['mels_for_ge2e'] = rng.standard_normal(
                    (b * ge2e.samples, ge2e.slice_length, cfg.sound.mel_dim)
                ).astype(np.float32)
        if cfg.uses_gradient_reversal:
            batch['pitches'] = rng.random((b, t_mel)).astype(np.float32)
        return batch

    # ------------------------------------------------------------------

    def _decode_step(self, bucket: int):
        decode = self._decode_cache.get(bucket)
        if decode is None:
            decode = jax.jit(self._decode_for(bucket))
            self._decode_cache[bucket] = decode
        return decode

    def _run_infer(self, batch, rng, noise_scale: float):
        """Two-phase bucketed synthesis: the prior phase predicts the
        durations, the host picks the smallest static mel bucket the
        batch fits (summed durations are already integers), and the
        decode phase runs at that capacity."""
        prior = self._prior(self.state, batch)
        need = int(np.asarray(prior['durations']).sum(axis=1).max())
        bucket = next((b for b in self.mel_buckets if b >= need),
                      self.mel_buckets[-1])
        return self._decode_step(bucket)(
            self.state, prior, batch, rng,
            np.float32(noise_scale))

    def synthesize_items(self, items: Sequence[Dict],
                         out_dir: Optional[str] = None,
                         noise_scale: float = 1.0,
                         seed: int = 0,
                         export_wav: bool = False,
                         griffin_lim_iterations: int = 60) -> List[Dict]:
        results = []
        for start in range(0, len(items), self.batch_size):
            chunk = list(items[start:start + self.batch_size])
            if self.mesh is not None:
                # pad ragged tail chunks to the device count, shard over
                # the mesh's data axis, and make the mesh ambient so
                # batch-parallel Pallas backends shard_map themselves
                ndev = self.mesh.shape['data']
                padded = chunk + [chunk[-1]] * ((-len(chunk)) % ndev)
                batch = self.collater(padded)
                batch = self._mesh_lib.shard_batch(self.mesh, batch)
                with self._mesh_lib.activate_mesh(self.mesh):
                    out = self._run_infer(batch,
                                          jax.random.PRNGKey(seed + start),
                                          noise_scale)
            else:
                batch = self.collater(chunk)
                out = self._run_infer(batch,
                                      jax.random.PRNGKey(seed + start),
                                      noise_scale)
            mels = np.asarray(out['mels'])
            lengths = np.asarray(out['mel_lengths'])
            attns = np.asarray(out['attentions'])
            for i, item in enumerate(chunk):
                label = item.get('label', str(start + i))
                t_tok = int(batch['token_lengths'][i])
                result = {
                    'label': label,
                    'text': item['text'],
                    'mel': mels[i, :lengths[i]],
                    'attention': attns[i, :t_tok, :lengths[i]],
                }
                results.append(result)
                if out_dir:
                    export_mel_figure(
                        os.path.join(out_dir, 'PNG', f'{label}.png'),
                        result['mel'], result['attention'],
                        title=item['text'])
                    export_npy(out_dir, label, result['mel'],
                               result['attention'])
                    if export_wav:
                        from glow_tts_tpu.ops import vocoder
                        audio = vocoder.mel_to_audio(
                            result['mel'], self.config.sound,
                            iterations=griffin_lim_iterations)
                        vocoder.save_wav(
                            os.path.join(out_dir, 'WAV', f'{label}.wav'),
                            audio, self.config.sound.sample_rate)
                        result['audio'] = audio
        return results

    def inference(self, labels: Sequence[str], texts: Sequence[str],
                  length_scales: Optional[Sequence[float]] = None,
                  speakers: Optional[Sequence[int]] = None,
                  wavs_for_ge2e: Optional[Sequence[str]] = None,
                  wavs_for_prosody: Optional[Sequence[str]] = None,
                  wavs_for_pitch: Optional[Sequence[str]] = None,
                  out_dir: Optional[str] = None,
                  export_wav: bool = False) -> List[Dict]:
        """Programmatic batch synthesis (reference ``Inference.py:225-256``)."""
        from glow_tts_tpu.data.pattern_generator import \
            load_reference_features
        n = len(texts)
        items = []
        for i in range(n):
            filtered = text_filtering(texts[i])
            if filtered is None:
                continue
            entry = {
                'label': labels[i],
                'text': filtered,
                'length_scale': (length_scales[i] if length_scales
                                 else 1.0),
                'speaker_id': (int(speakers[i]) if speakers is not None
                               else 0),
                'wav_for_ge2e': wavs_for_ge2e[i] if wavs_for_ge2e else None,
                'wav_for_prosody': (wavs_for_prosody[i]
                                    if wavs_for_prosody else None),
                'wav_for_pitch': (wavs_for_pitch[i]
                                  if wavs_for_pitch else None),
            }
            items.append(load_reference_features(self.config, entry))
        return self.synthesize_items(items, out_dir, export_wav=export_wav)

    def inference_from_file(self, tsv_path: str,
                            out_dir: Optional[str] = None,
                            export_wav: bool = False) -> List[Dict]:
        from glow_tts_tpu.data.pattern_generator import \
            load_reference_features
        dataset = InferenceDataset(tsv_path)
        items = [load_reference_features(self.config, dataset[i])
                 for i in range(len(dataset))]
        return self.synthesize_items(items, out_dir, export_wav=export_wav)
