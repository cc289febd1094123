"""TSV inference-spec parsing and the Inferencer file path (Vanilla mode —
reference-format file, including the actual reference's own TSV)."""

import numpy as np

from glow_tts_tpu.data.patterns import InferenceDataset


def test_parses_reference_tsv_format(tmp_path):
    path = tmp_path / 'spec.txt'
    path.write_text(
        'Label\tText\tLength_Scale\tSpeaker\tWav_for_Speaker\t'
        'Wav_for_Prosody\tWav_for_Pitch\n'
        'A_0\tBirds of a feather flock together.\t0.8\t3\tx.wav\ty.wav\tz.wav\n'
        'B_1\tbad 123 line with digits inside\t1.0\t0\tx.wav\ty.wav\tz.wav\n'
        'C_2\tShort one.\t1.25\t7\ta.wav\tb.wav\tc.wav\n')
    ds = InferenceDataset(str(path))
    # the digits line fails text filtering and is dropped
    assert len(ds) == 2
    first = ds[0]
    assert first['label'] == 'A_0'
    assert first['text'] == 'BIRDS OF A FEATHER FLOCK TOGETHER.'
    assert first['length_scale'] == 0.8
    assert first['speaker_id'] == 3
    assert ds[1]['length_scale'] == 1.25


def test_parses_actual_reference_file():
    ds = InferenceDataset('/root/reference/Inference_Text_for_Vanilla.txt')
    assert len(ds) > 0
    scales = {item['length_scale'] for item in ds.entries}
    assert all(0.5 <= s <= 2.0 for s in scales)
    assert all(item['text'] == item['text'].upper() for item in ds.entries)
