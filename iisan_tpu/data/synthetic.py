"""Synthetic fixtures: random corpora and hidden-state caches.

Used by the test-suite and benchmarks to exercise the cached pipeline
without the (multi-GB, not-shipped) image LMDB and tower weights - the
synthetic cache has the exact shape/layout contract of the real one
(/root/reference/Code_Cached/preprocess_vectors.py:89-103: [layers+1, dim]
per item, embeddings row first).
"""

from __future__ import annotations

import numpy as np

from .preprocess import Corpus


def synthetic_corpus(n_users: int = 64, item_num: int = 200,
                     max_seq_len: int = 10, min_seq_len: int = 5,
                     seed: int = 0) -> Corpus:
    rng = np.random.default_rng(seed)
    L = max_seq_len
    H = L + 2
    train_seqs = np.zeros((n_users, L + 1), np.int32)
    train_log_mask = np.zeros((n_users, L), np.float32)
    valid_tokens = np.zeros((n_users, L), np.int32)
    valid_log_mask = np.zeros((n_users, L), np.float32)
    valid_target = np.zeros(n_users, np.int32)
    valid_history = np.zeros((n_users, H), np.int32)
    test_tokens = np.zeros((n_users, L), np.int32)
    test_log_mask = np.zeros((n_users, L), np.float32)
    test_target = np.zeros(n_users, np.int32)
    test_history = np.zeros((n_users, H), np.int32)
    counts = np.zeros(item_num + 1, np.int64)
    for u in range(n_users):
        n = int(rng.integers(min_seq_len, L + 4))
        seq = rng.integers(1, item_num + 1, size=n)
        train = seq[:-2]
        t = train[-(L + 1):]
        train_seqs[u, L + 1 - len(t):] = t
        train_log_mask[u, L - (len(t) - 1):] = 1.0
        for i in train:
            counts[i] += 1
        valid = seq[-(L + 2):-1]
        vt = valid[:-1]
        valid_tokens[u, L - len(vt):] = vt
        valid_log_mask[u, L - len(vt):] = 1.0
        valid_target[u] = valid[-1]
        test = seq[-(L + 1):]
        tt = test[:-1]
        test_tokens[u, L - len(tt):] = tt
        test_log_mask[u, L - len(tt):] = 1.0
        test_target[u] = test[-1]
        valid_history[u, :len(train)] = train
        test_history[u, :len(seq) - 1] = seq[:-1]
    pop = np.maximum(counts[1:], 1).astype(np.float64)
    pop = pop / pop.sum()
    pop_prob = np.concatenate([[1.0], pop]).astype(np.float32)
    return Corpus(
        item_num=item_num, max_seq_len=L,
        item_names=["<pad>"] + [f"item{i}" for i in range(1, item_num + 1)],
        train_seqs=train_seqs, train_log_mask=train_log_mask,
        valid_tokens=valid_tokens, valid_log_mask=valid_log_mask,
        valid_target=valid_target, valid_history=valid_history,
        test_tokens=test_tokens, test_log_mask=test_log_mask,
        test_target=test_target, test_history=test_history,
        pop_prob=pop_prob,
    )


def synthetic_taps(item_num: int, k: int, dim: int,
                   seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    taps = rng.standard_normal((item_num + 1, k, dim)).astype(np.float32)
    taps[0] = 0.0  # padding item row is zeros (dataset.py:277-280)
    return taps
