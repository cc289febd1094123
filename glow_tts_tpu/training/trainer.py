"""Training orchestration: step loop with interval-triggered checkpoint /
logging / evaluation / inference, graceful-interrupt checkpointing.

Capability surface of the reference ``Trainer`` (``Train.py:49-590``):
* interval hooks — checkpoint, scalar logging (interval-averaged + LR),
  evaluation (losses + teacher-forced vs free-running attention images),
  inference on a fixed TSV sentence file with PNG/NPY export, prosody
  embedding projector check (PE/GR)
* KeyboardInterrupt → checkpoint → exit (``Train.py:582-587``)
* resume from latest or exact step

TPU-first differences: one jit-compiled step per role; batches stream
through a prefetching loader sharded over the mesh's data axis; throughput
(frames/sec/chip, step time) is logged — the reference has no profiling
(SURVEY §5).  Optional ``jax.profiler`` trace capture around a step window.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np

from glow_tts_tpu.config import Config
from glow_tts_tpu.data.collate import (InferenceCollater, ProsodyCheckCollater,
                                       TrainCollater)
from glow_tts_tpu.data.loader import DataLoader
from glow_tts_tpu.data.patterns import (InferenceDataset, PatternDataset,
                                        ProsodyCheckDataset)
from glow_tts_tpu.parallel import mesh as mesh_lib
from glow_tts_tpu.text import Tokenizer, load_token_dict
from glow_tts_tpu.training.checkpoint import CheckpointManager
from glow_tts_tpu.training.optim import learning_rate_at
from glow_tts_tpu.training.step import (create_train_state, make_eval_step,
                                        make_inference_step, make_train_step)
from glow_tts_tpu.utils.logging import StepTimer, SummaryLogger, logger
from glow_tts_tpu.utils.plotting import export_mel_figure, export_npy


def attention_diagonality(attentions: np.ndarray,
                          token_lengths: np.ndarray,
                          mel_lengths: np.ndarray) -> float:
    """Mean closeness of MAS paths to the ideal diagonal — a quantitative
    alignment-health signal (the reference only eyeballs attention images,
    ``Train.py:341-346``).  1.0 = perfectly linear alignment."""
    scores = []
    for i in range(attentions.shape[0]):
        tx, ty = int(token_lengths[i]), int(mel_lengths[i])
        if tx < 2 or ty < 2:
            continue
        idx = np.argmax(attentions[i, :tx, :ty], axis=0)     # token per frame
        ideal = np.arange(ty) * (tx - 1) / (ty - 1)
        scores.append(1.0 - np.abs(idx - ideal).mean() / tx)
    return float(np.mean(scores)) if scores else 0.0


@jax.jit
def attention_diagonality_device(attentions, token_lengths, mel_lengths):
    """SPMD-safe :func:`attention_diagonality`: runs where the (possibly
    multi-host sharded) attention lives and returns a replicated scalar, so
    eval metrics aggregate over the global batch with no host gathers."""
    import jax.numpy as jnp
    b, t_tok, t_mel = attentions.shape
    tx = token_lengths.astype(jnp.float32)
    ty = mel_lengths.astype(jnp.float32)
    idx = jnp.argmax(attentions, axis=1).astype(jnp.float32)   # [B, T_mel]
    frames = jnp.arange(t_mel, dtype=jnp.float32)[None, :]
    ideal = frames * (tx[:, None] - 1.0) / jnp.maximum(ty[:, None] - 1.0, 1.0)
    valid = frames < ty[:, None]
    err = jnp.sum(jnp.abs(idx - ideal) * valid, axis=1) \
        / jnp.maximum(ty, 1.0)
    score = 1.0 - err / jnp.maximum(tx, 1.0)
    ok = (token_lengths >= 2) & (mel_lengths >= 2)
    return jnp.sum(score * ok) / jnp.maximum(jnp.sum(ok), 1)


class _NullWriter:
    """No-op summary writer for non-main processes on a pod."""

    def add_scalars(self, *a, **k): pass
    def add_images(self, *a, **k): pass
    def add_histograms(self, *a, **k): pass
    def add_embedding(self, *a, **k): pass


class Trainer:
    def __init__(self, config: Config, initial_step: int = 0,
                 use_mesh: bool = True, max_mel_length: int = 1024):
        self.config = config
        self.max_mel_length = max_mel_length
        if config.tpu.matmul_precision != 'default':
            jax.config.update('jax_default_matmul_precision',
                              config.tpu.matmul_precision)

        # Multi-host: every process of a pod slice runs this same program
        # with per-host data loading; writes happen on process 0 only
        # (checkpoint *saves* are collective — orbax coordinates them).
        self.num_processes = mesh_lib.process_count()
        self.process_index = mesh_lib.process_index()
        self.is_main = self.process_index == 0
        if config.train.batch_size % self.num_processes:
            raise ValueError(
                f'global batch size {config.train.batch_size} must divide '
                f'by process count {self.num_processes}')
        self.local_batch_size = config.train.batch_size // self.num_processes

        token_dict = None
        if config.token_path and os.path.exists(config.token_path):
            token_dict = load_token_dict(config.token_path)
        self.tokenizer = Tokenizer(token_dict)

        self.mesh = None
        if use_mesh and (len(jax.devices()) > 1 or self.num_processes > 1):
            self.mesh = mesh_lib.make_mesh(config)

        self._build_datasets()
        self._build_model(initial_step)
        self._build_logging()

        self.train_step = self._with_mesh(
            jax.jit(make_train_step(config, self.model), donate_argnums=0))
        # Alignment-curriculum variants (linear path / frozen decoder),
        # one jit specialisation per flag combination; selected per-step
        # on the host (``_select_train_step``).
        self._curriculum_steps = {}
        warm_mode = config.train.alignment_warmup_mode
        for warm in (True, False):
            for frozen in (True, False):
                if warm and not config.train.alignment_warmup_steps:
                    continue
                if frozen and not config.train.decoder_freeze_steps:
                    continue
                if not warm and not frozen:
                    continue
                self._curriculum_steps[(warm, frozen)] = self._with_mesh(
                    jax.jit(make_train_step(
                        config, self.model,
                        linear_alignment=warm and warm_mode == 'linear',
                        anchored_alignment=warm and warm_mode == 'anchored',
                        em_alignment=warm and warm_mode == 'em',
                        freeze_decoder=frozen), donate_argnums=0))
        self.eval_step = self._with_mesh(
            jax.jit(make_eval_step(config, self.model)))
        self.inference_step = self._with_mesh(jax.jit(make_inference_step(
            config, self.model, max_mel_length=max_mel_length)))
        self.timer = StepTimer()
        self.scalar_accum: Dict[str, float] = defaultdict(float)

    def _with_mesh(self, fn):
        """Make the mesh ambient while a jitted step runs (matters only on
        the first, tracing, call): batch-parallel Pallas ops (MAS, fused
        coupling) then shard_map themselves over the 'data' axis instead
        of being computed on GSPMD-gathered operands."""
        if self.mesh is None:
            return fn

        def wrapped(*args, **kwargs):
            with mesh_lib.activate_mesh(self.mesh):
                return fn(*args, **kwargs)
        return wrapped

    # ------------------------------------------------------------------

    def _build_datasets(self):
        cfg = self.config
        train_pattern = cfg.train.train_pattern
        eval_pattern = cfg.train.eval_pattern
        self.train_dataset = PatternDataset(
            pattern_path=train_pattern.path,
            metadata_file=train_pattern.metadata_file,
            accumulated_dataset_epoch=train_pattern.accumulated_dataset_epoch,
            mel_length_min=train_pattern.mel_length_min,
            mel_length_max=train_pattern.mel_length_max,
            text_length_min=train_pattern.text_length_min,
            text_length_max=train_pattern.text_length_max,
            use_cache=cfg.train.use_pattern_cache)
        self.eval_dataset = PatternDataset(
            pattern_path=eval_pattern.path,
            metadata_file=eval_pattern.metadata_file,
            mel_length_min=eval_pattern.mel_length_min,
            mel_length_max=eval_pattern.mel_length_max,
            text_length_min=eval_pattern.text_length_min,
            text_length_max=eval_pattern.text_length_max,
            use_cache=cfg.train.use_pattern_cache)

    def _build_model(self, initial_step: int):
        cfg = self.config
        collater = TrainCollater(cfg, self.tokenizer)
        # deliberately UNsharded (shuffle off, no process shard): every pod
        # process must run ActNorm's data-dependent init on the *same* first
        # batch or the replicated parameters would diverge across hosts
        loader = DataLoader(self.train_dataset, collater,
                            self.local_batch_size, shuffle=False, prefetch=0)
        init_batch = next(iter(loader))
        self.model, self.state = create_train_state(
            cfg, jax.random.PRNGKey(0), init_batch)
        self.checkpoints = CheckpointManager(
            cfg.checkpoint_path, cfg if self.is_main else None)
        restored = self.checkpoints.restore(self.state, initial_step)
        self.step = 0
        if restored is not None:
            self.state, self.step = restored
            logger.info('Restored checkpoint at step %d', self.step)
        elif (cfg.uses_speaker_embedding
              and cfg.speaker_embedding.type.upper() == 'GE2E'
              and cfg.speaker_embedding.ge2e.checkpoint_path):
            self._load_ge2e(cfg.speaker_embedding.ge2e.checkpoint_path)
        # Commit the state onto the mesh: tensor-parallel parameter /
        # optimizer-moment shardings over 'model' (parallel/tp.py), plain
        # explicit replication when model_parallel == 1.
        if self.mesh is not None and self.num_processes == 1:
            from glow_tts_tpu.parallel import tp
            self.state = tp.place_state(self.state, self.mesh)
            if self.mesh.shape.get('model', 1) > 1:
                sharded, total = tp.sharded_param_count(self.state, self.mesh)
                logger.info(
                    'tensor parallel over model=%d: %d / %d parameters '
                    'sharded (%.0f%%)', self.mesh.shape['model'], sharded,
                    total, 100.0 * sharded / total)
        elif cfg.tpu.model_parallel > 1:
            raise NotImplementedError(
                'model_parallel > 1 is single-process only — multi-host '
                'runs scale over the data axis (DCN); see parallel/tp.py')

    def _load_ge2e(self, path: str):
        """Load the pre-trained GE2E d-vector weights from a torch
        checkpoint at step 0 (reference ``Train.py:555-561``)."""
        import pickle
        from glow_tts_tpu.utils.torch_import import convert_ge2e_state_dict
        try:
            try:
                import torch
                payload = torch.load(path, map_location='cpu',
                                     weights_only=False)
            except Exception:
                with open(path, 'rb') as f:
                    payload = pickle.load(f)
            state_dict = payload.get('Model', payload) \
                if isinstance(payload, dict) else payload
            if hasattr(state_dict, 'state_dict'):
                state_dict = state_dict.state_dict()
            ge2e_params = convert_ge2e_state_dict(state_dict, self.config)
            params = dict(self.state.params)
            params['ge2e'] = ge2e_params
            self.state = self.state.replace(params=params)
            logger.info('Loaded pre-trained GE2E weights from %s', path)
        except Exception as error:
            logger.warning('Could not load GE2E checkpoint %s: %s',
                           path, error)

    def _build_logging(self):
        cfg = self.config
        if not self.is_main:
            null = _NullWriter()
            self.writers = {'train': null, 'eval': null}
            return
        self.writers = {
            'train': SummaryLogger(os.path.join(cfg.log_path, 'Train')),
            'eval': SummaryLogger(os.path.join(cfg.log_path, 'Evaluation')),
        }

    def _device_put(self, batch, replicate: bool = False):
        # host-side frame count rides along so step accounting never has
        # to read a device array back (global across the pod: every process
        # loads 1/num_processes of the batch)
        num_frames = (int(np.asarray(batch['mel_lengths']).sum())
                      * (1 if replicate else self.num_processes))
        if self.mesh is not None:
            arrays = {k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            if replicate:
                arrays = mesh_lib.replicate_host_local_batch(
                    self.mesh, arrays)
            elif self.num_processes > 1:
                arrays = mesh_lib.shard_host_local_batch(self.mesh, arrays)
            else:
                arrays = mesh_lib.shard_batch(self.mesh, arrays)
            batch = {**batch, **arrays}
        batch['num_frames'] = num_frames
        return batch

    def _train_loader(self, seed: int):
        # Num_Workers (reference: DataLoader worker processes) maps to
        # parallel producer threads feeding the prefetch queue.  Each pod
        # process loads a disjoint shard of every epoch (deterministic
        # seeded permutation, strided by process index).
        workers = max(self.config.train.num_workers, 1)
        return DataLoader(self.train_dataset,
                          TrainCollater(self.config, self.tokenizer),
                          self.local_batch_size,
                          shuffle=True, seed=seed,
                          prefetch=2 * workers,
                          device_put=self._device_put,
                          shard_index=self.process_index,
                          num_shards=self.num_processes,
                          workers=workers)

    # ------------------------------------------------------------------

    def train(self, profile_steps: Optional[tuple] = None):
        cfg = self.config.train
        # Resume-exact data order: the reference checkpoints and restores
        # its epoch counter (``Train.py:535-553``) so a resumed run does
        # not replay epoch 0; batches-per-epoch is deterministic here
        # (seeded bucket sampler), so the epoch AND the intra-epoch
        # offset derive from the restored step — a resumed run consumes
        # exactly the batches the uninterrupted run would have.
        batches_per_epoch = len(self._train_loader(seed=0))
        epoch = self.step // batches_per_epoch if batches_per_epoch else 0
        skip_batches = (self.step % batches_per_epoch
                        if batches_per_epoch else 0)
        # Preemption safety: SIGTERM (TPU maintenance / spot reclaim)
        # checkpoints before exit — the reference only handles Ctrl-C
        # (``Train.py:582-587``).
        import signal

        def _on_sigterm(signum, frame):
            raise KeyboardInterrupt('SIGTERM')

        previous_handler = signal.signal(signal.SIGTERM, _on_sigterm)

        # reference runs an evaluation pass before training starts
        # (``Train.py:563-570``) and optionally an initial inference
        if self.step == 0:
            self.evaluate()
            if cfg.initial_inference and cfg.inference_pattern_file_in_train:
                self.run_inference_file(cfg.inference_pattern_file_in_train)
        try:
            while self.step < cfg.max_step:
                for bi, batch in enumerate(self._train_loader(seed=epoch)):
                    if skip_batches and bi < skip_batches:
                        continue       # realign a mid-epoch resume
                    num_frames = batch.pop(
                        'num_frames',
                        None) or int(np.asarray(batch['mel_lengths']).sum())
                    if profile_steps and self.step == profile_steps[0]:
                        jax.profiler.start_trace(
                            os.path.join(self.config.log_path, 'profile'))
                    linear = self.step < cfg.alignment_warmup_steps
                    frozen = self.step < cfg.decoder_freeze_steps
                    step_fn = self._curriculum_steps.get(
                        (linear, frozen), self.train_step)
                    self.state, metrics = step_fn(self.state, batch)
                    self.step += 1
                    if profile_steps and self.step == profile_steps[1]:
                        jax.block_until_ready(self.state)
                        jax.profiler.stop_trace()
                    self._after_step(metrics, num_frames)
                    if self.step >= cfg.max_step:
                        break
                skip_batches = 0
                epoch += 1
        except KeyboardInterrupt:
            logger.info('Interrupted — saving checkpoint at step %d',
                        self.step)
            self.checkpoints.save(self.step, self.state, wait=True)
            raise
        finally:
            signal.signal(signal.SIGTERM, previous_handler)
        self.checkpoints.save(self.step, self.state, wait=True)

    def _after_step(self, metrics, num_frames: int):
        cfg = self.config.train
        self.timer.add_frames(num_frames)
        # Accumulate on-device: forcing metrics to host floats every step
        # would serialise the dispatch pipeline behind a device sync.
        for tag, value in metrics.items():
            self.scalar_accum[f'Loss/{tag}'] = (
                self.scalar_accum.get(f'Loss/{tag}', 0.0) + value)

        if self.step % cfg.checkpoint_save_interval == 0:
            # collective on a pod: every process participates and orbax
            # coordinates the single-writer commit (process-0-only saving
            # would deadlock on multi-host arrays)
            self.checkpoints.save(self.step, self.state)
        if self.step % cfg.logging_interval == 0:
            scalars = {tag: float(np.asarray(value)) / cfg.logging_interval
                       for tag, value in self.scalar_accum.items()}
            # Failure detection (absent in the reference): stop on NaNs
            # instead of training through them; last checkpoint survives.
            if not np.isfinite(scalars.get('Loss/total', 0.0)):
                logger.error('Non-finite loss around step %d — aborting; '
                             'last checkpoint preserved in %s', self.step,
                             self.checkpoints.directory)
                raise FloatingPointError(
                    f'non-finite training loss at step {self.step}')
            scalars['Learning_Rate'] = float(
                learning_rate_at(self.config, self.step))
            scalars.update(self.timer.tick(cfg.logging_interval))
            self.writers['train'].add_scalars(scalars, self.step)
            self.scalar_accum = defaultdict(float)
        if self.step % cfg.evaluation_interval == 0:
            self.evaluate()
        if self.step % cfg.inference_interval == 0 and \
                cfg.inference_pattern_file_in_train:
            self.run_inference_file(cfg.inference_pattern_file_in_train)
        if self.config.uses_prosody_encoder and \
                self.step % cfg.prosody_check_interval == 0:
            self.prosody_check()

    # ------------------------------------------------------------------

    def evaluate(self):
        """Dev losses + teacher-forced vs free-running attention images
        (the reference's de-facto alignment correctness check,
        ``Train.py:267-358``).

        Sharded like training: each pod process loads a disjoint eval shard
        and the jitted eval step consumes the globally-sharded batch, so
        every loss scalar is already the global-batch mean (replicated) —
        eval throughput scales with the mesh and no gather is needed."""
        import itertools
        collater = TrainCollater(self.config, self.tokenizer)
        # every process must execute the same number of collective steps;
        # on a pod that means a fixed per-process batch count
        if self.num_processes > 1:
            num_batches = ((len(self.eval_dataset) // self.num_processes)
                           // self.local_batch_size)
            drop_last = True
        else:
            num_batches = None
            drop_last = False
        loader = DataLoader(self.eval_dataset, collater,
                            self.local_batch_size, shuffle=False,
                            prefetch=0, drop_last=drop_last,
                            shard_index=self.process_index,
                            num_shards=self.num_processes)
        data_axis = self.mesh.shape['data'] if self.mesh is not None else 1
        totals: Dict[str, float] = defaultdict(float)
        count = 0
        last = None
        iterator = iter(loader)
        if num_batches is not None:
            iterator = itertools.islice(iterator, num_batches)
        for batch in iterator:
            batch.pop('num_frames', None)
            rows = batch['tokens'].shape[0]
            host_batch = batch
            if self.mesh is not None and (self.num_processes > 1
                                          or rows % data_axis == 0):
                batch = self._device_put(dict(batch))
                batch.pop('num_frames', None)
            loss_dict, outputs = self.eval_step(self.state, batch)
            for tag, value in loss_dict.items():
                totals[f'Loss/{tag}'] += float(np.asarray(value))
            totals['Alignment/diagonality'] += float(np.asarray(
                attention_diagonality_device(
                    outputs['attentions'], batch['token_lengths'],
                    batch['mel_lengths'])))
            count += 1
            last = (host_batch, batch, outputs)
        if not count:
            return
        self.writers['eval'].add_scalars(
            {tag: value / count for tag, value in totals.items()}, self.step)

        if last is not None:
            host_batch, batch, outputs = last
            infer_batch = {
                'tokens': batch['tokens'],
                'token_lengths': batch['token_lengths'],
                'speakers': batch.get('speakers'),
                'mels_for_ge2e': batch.get('mels_for_ge2e'),
                'mels_for_prosody': batch.get('mels'),
                'mel_lengths_for_prosody': batch.get('mel_lengths'),
                'pitches': batch.get('pitches'),
                'pitch_lengths': batch.get('mel_lengths'),
            }
            free = self.inference_step(self.state, infer_batch,
                                       jax.random.PRNGKey(self.step))
            if not self.is_main:
                return
            # image export reads this process's local rows only
            attn_train = mesh_lib.local_batch_view(outputs['attentions'])
            attn_free = mesh_lib.local_batch_view(free['attentions'])
            i = 0
            t_tok = int(host_batch['token_lengths'][i])
            t_mel = int(host_batch['mel_lengths'][i])
            self.writers['eval'].add_images({
                'Mel/Target': np.asarray(host_batch['mels'][i, :t_mel]).T,
                'Attention/From_Train': attn_train[i, :t_tok, :t_mel],
                'Attention/From_Inference': attn_free[i, :t_tok],
            }, self.step)
            self.writers['eval'].add_histograms(self.state.params, self.step)

    def run_inference_file(self, pattern_file: str):
        """Synthesise the fixed TSV sentences; export PNG + NPY trees
        (reference ``Train.py:445-468``)."""
        from glow_tts_tpu.data.pattern_generator import (
            load_reference_features)
        dataset = InferenceDataset(pattern_file)
        if not len(dataset):
            return
        collater = InferenceCollater(self.config, self.tokenizer)
        items = [load_reference_features(self.config, dataset[i])
                 for i in range(len(dataset))]
        batch_size = self.config.inference_batch_size \
            or self.config.train.batch_size
        out_dir = os.path.join(self.config.inference_path,
                               f'Step-{self.step}')
        for start in range(0, len(items), batch_size):
            chunk = items[start:start + batch_size]
            batch = collater(chunk)
            if self.num_processes > 1 and self.mesh is not None:
                # fixed sentences are identical on every pod process —
                # replicate them (collective step; exports below are
                # process-0 only)
                batch = self._device_put(batch, replicate=True)
                batch.pop('num_frames', None)
            outputs = self.inference_step(self.state, batch,
                                          jax.random.PRNGKey(self.step))
            if not self.is_main:
                continue
            mels = np.asarray(outputs['mels'])
            lengths = np.asarray(outputs['mel_lengths'])
            attns = np.asarray(outputs['attentions'])
            for i, item in enumerate(chunk):
                label = item.get('label', f'{start + i}')
                t_tok = int(batch['token_lengths'][i])
                mel = mels[i, :lengths[i]]
                attn = attns[i, :t_tok, :lengths[i]]
                export_mel_figure(
                    os.path.join(out_dir, 'PNG', f'{label}.png'),
                    mel, attn, title=item.get('text', ''))
                export_npy(out_dir, label, mel, attn)

    def prosody_check(self):
        """GST embedding projector snapshot (reference ``Train.py:470-492``)."""
        dataset = ProsodyCheckDataset(
            pattern_path=self.config.train.eval_pattern.path,
            metadata_file=self.config.train.eval_pattern.metadata_file,
            mel_length_min=self.config.train.eval_pattern.mel_length_min,
            mel_length_max=self.config.train.eval_pattern.mel_length_max)
        if not len(dataset):
            return
        collater = ProsodyCheckCollater(self.config)
        loader = DataLoader(dataset, collater,
                            self.config.train.batch_size, shuffle=False,
                            prefetch=0, drop_last=False)
        embeddings, labels = [], []
        for batch in loader:
            if self.num_processes > 1 and self.mesh is not None:
                batch = self._device_put(batch, replicate=True)
                batch.pop('num_frames', None)
            out = self.model.apply(
                {'params': self.state.params},
                batch['mels'], batch['mel_lengths'],
                method='encode_prosody')
            embeddings.append(np.asarray(out))
            labels.extend(batch['labels'])
        self.writers['eval'].add_embedding(
            np.concatenate(embeddings), labels, self.step, tag='GST')
