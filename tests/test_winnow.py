

def test_winnow_batch_vectorization_is_exact():
    """Round 6: _winnow_batch_fp_sets (whole-batch, global exponent
    tables) must reproduce the per-doc loop's fingerprint sets to the
    bit — the ring-arithmetic argument (inv^s / B^s factors cancel mod
    2^64) checked empirically over boundary lengths around k and
    k+window, including empty and sub-k documents."""
    import random

    import numpy as np

    from gobulk_spark.operators.text import _winnow_batch_fp_sets

    np.seterr(over="ignore")

    def loop_ref(encoded, k, window):
        B = np.uint64(1000003)
        inv = np.uint64(pow(1000003, -1, 1 << 64))
        max_len = max((len(e) for e in encoded), default=0)
        one = np.ones(1, dtype=np.uint64)
        if max_len > 1:
            powers_all = np.concatenate(
                [one, np.cumprod(np.full(max_len - 1, B, dtype=np.uint64))]
            )
            invpow_all = np.concatenate(
                [one, np.cumprod(np.full(max_len - 1, inv, dtype=np.uint64))]
            )
        else:
            powers_all = invpow_all = one
        out = []
        for raw in encoded:
            b = np.frombuffer(raw, dtype=np.uint8)
            n = len(b) - k + 1
            if n <= 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            invpow = invpow_all[: len(b)]
            powers = powers_all[: len(b)]
            csum = np.cumsum(b.astype(np.uint64) * invpow, dtype=np.uint64)
            seg = csum[k - 1 :].copy()
            seg[1:] -= csum[: n - 1]
            h = seg * powers[k - 1 : k - 1 + n]
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
            if n <= window:
                m = int(np.flatnonzero(h == h.min())[-1])
                out.append(np.array([int(h[m] >> np.uint64(1))], dtype=np.int64))
                continue
            win = np.lib.stride_tricks.sliding_window_view(h, window)
            arg = window - 1 - win[:, ::-1].argmin(axis=1)
            pos = arg + np.arange(len(win))
            out.append(np.unique(h[pos] >> np.uint64(1)).astype(np.int64))
        return out

    rng = random.Random(7)
    for k, window in ((16, 8), (5, 4), (3, 2), (2, 1)):
        docs = []
        for _ in range(300):
            n = rng.choice(
                [0, 1, k - 1, k, k + 1, k + window - 1, k + window, 50, 400]
            )
            docs.append("".join(rng.choice("ab c") for _ in range(n)))
        enc = [d.encode("utf-8", "ignore") for d in docs]
        got = _winnow_batch_fp_sets(enc, k, window)
        want = loop_ref(enc, k, window)
        assert all(np.array_equal(a, b) for a, b in zip(got, want))
