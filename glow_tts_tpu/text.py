"""Text normalisation and tokenisation.

Parity surface: ``Pattern_Generator.py:22-39`` (``Text_Filtering``),
``Datasets.py:17-21`` (``Text_to_Token``) and ``Pattern_Generator.py:401-411``
(token-dictionary generation) in the reference.  The token id assignment is
reproduced exactly so that pattern archives and checkpoints interoperate.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence

import numpy as np
import yaml

# Uppercase charset accepted by the reference (``Pattern_Generator.py:19``).
_CHARSET_RE = re.compile(r"[A-Z,.?!'\-\s]+")

BOS = '<S>'
EOS = '<E>'


def text_filtering(text: str) -> Optional[str]:
    """Normalise raw transcript text; return ``None`` if it is unusable.

    Mirrors the reference exactly: uppercase, strip bracket/quote characters,
    collapse doubled spaces, and accept only strings made of a single run of
    the ``[A-Z,.?!'\\-\\s]`` charset that does not start with an apostrophe.
    """
    remove_letters = ['(', ')', '"', '[', ']', ':', ';']
    replacements = [('  ', ' '), (' ,', ','), ("' ", "'")]

    text = text.upper().strip()
    for ch in remove_letters:
        text = text.replace(ch, '')
    for old, new in replacements:
        text = text.replace(old, new)
    text = text.strip()

    runs = _CHARSET_RE.findall(text)
    if len(runs) != 1:
        return None
    if text.startswith("'"):
        return None
    return runs[0]


def build_token_dict(texts: Sequence[str]) -> Dict[str, int]:
    """Build the letter→id dictionary: sorted unique letters preceded by
    ``<S>``/``<E>`` sentinels (reference ``Pattern_Generator.py:401-411``)."""
    letters = sorted(set(''.join(texts)))
    tokens = [BOS, EOS] + letters
    return {token: index for index, token in enumerate(tokens)}


def default_token_dict() -> Dict[str, int]:
    """The 35-token dictionary implied by the reference charset and
    ``Encoder.Embedding_Tokens: 35`` (``Hyper_Parameters.yaml:22``).

    Letters are the full accepted charset in sorted order.
    """
    letters = sorted(set(" ',-.?!" + 'ABCDEFGHIJKLMNOPQRSTUVWXYZ'))
    tokens = [BOS, EOS] + letters
    return {token: index for index, token in enumerate(tokens)}


def save_token_dict(token_dict: Dict[str, int], path: str) -> None:
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    with open(path, 'w', encoding='utf-8') as f:
        yaml.dump(token_dict, f, allow_unicode=True)


def load_token_dict(path: str) -> Dict[str, int]:
    with open(path, encoding='utf-8') as f:
        return yaml.load(f, Loader=yaml.Loader)


class Tokenizer:
    """Letter tokenizer wrapping the token dictionary.

    ``encode`` brackets the text with ``<S>``/``<E>`` exactly like the
    reference ``Text_to_Token`` (``Datasets.py:17-21``).
    """

    def __init__(self, token_dict: Optional[Dict[str, int]] = None):
        self.token_dict = dict(token_dict or default_token_dict())
        self.inverse = {v: k for k, v in self.token_dict.items()}

    @classmethod
    def from_yaml(cls, path: str) -> 'Tokenizer':
        return cls(load_token_dict(path))

    @property
    def vocab_size(self) -> int:
        return len(self.token_dict)

    @property
    def bos_id(self) -> int:
        return self.token_dict[BOS]

    @property
    def eos_id(self) -> int:
        return self.token_dict[EOS]

    def encode(self, text: str) -> np.ndarray:
        unknown = sorted({c for c in text if c not in self.token_dict})
        if unknown:
            raise ValueError(
                f'text contains characters missing from the token '
                f'dictionary: {unknown!r} (the dictionary is built from the '
                f'training corpus — regenerate it with the ETL, or filter '
                f'the text) in {text!r}')
        return np.array(
            [self.token_dict[letter] for letter in [BOS] + list(text) + [EOS]],
            dtype=np.int32)

    def decode(self, ids: Sequence[int]) -> str:
        return ''.join(
            self.inverse[int(i)] for i in ids
            if self.inverse.get(int(i)) not in (BOS, EOS, None))

    def encode_batch(self, texts: List[str], pad_to: Optional[int] = None):
        """Encode and right-pad with ``<E>`` (reference ``Datasets.py:23-30``).

        Returns (tokens [B, T], lengths [B]).
        """
        encoded = [self.encode(t) for t in texts]
        lengths = np.array([e.shape[0] for e in encoded], dtype=np.int32)
        max_len = pad_to or int(lengths.max())
        tokens = np.full((len(encoded), max_len), self.eos_id, dtype=np.int32)
        for i, e in enumerate(encoded):
            tokens[i, :e.shape[0]] = e
        return tokens, lengths
