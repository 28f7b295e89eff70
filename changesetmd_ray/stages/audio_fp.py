"""Audio fingerprinting + near-duplicate detection — the audio leg of
the modality triangle (text SimHash / image pHash / audio constellation),
a Shazam-style landmark scheme (Wang 2003, ISMIR) reduced to a
deterministic dependency-free core.

Fingerprint (pinned by tests/test_audio_fp.py):

1. mono PCM → overlapping frames (``n_fft=512``, ``hop=256``) via
   stride tricks, Hann window, one batched ``rfft`` for the whole
   clip — no per-frame Python;
2. per frame keep the ``n_peaks`` strongest spectral bins above the
   frame's median magnitude (the "constellation");
3. hash every (anchor, target) peak pair within a forward fan-out
   window: ``hash = f1 << 18 | f2 << 7 | dt`` (9+9+7 bits packed in an
   int64), emitted with the anchor's frame index.

Matching is ALIGNMENT-VERIFIED, the property that makes the scheme
robust to time shifts: two clips count as near-dups when ≥
``min_matches`` hashes agree at ONE CONSISTENT time offset
(``dt_anchor = t_a − t_b``) — random hash collisions scatter across
offsets and never concentrate. Calibrate ``min_matches`` to the
corpus: rich real-audio spectra give specific landmarks (literature
uses ~10-20 matches), while tone-like/synthetic audio is degenerate —
a sustained pure tone repeats the same skirt-bin landmarks every
frame, so unrelated tone clips accumulate coincidences (measured at
1 k two-second tone-sequence clips: planted-copy matches ≥ 838,
spurious ≤ 90 — threshold 200 splits with ~4× margin either way,
tools/stress_audio.py).

Scale shape (same two-phase discipline as the other near-dup ops):
the corpus maps to thin ``(hash, id, t)`` rows in-flight (payload
never shuffles), hashes fold into buckets for ONE groupby, per-bucket
pair emission is capped per hash (``max_ids_per_hash`` drops
degenerate hot landmarks — silence, test tones), and the final
``(id_a, id_b, offset)`` histogram reduces in a second thin groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from changesetmd_ray.text.hashing import check_pow2, splitmix64

N_FFT = 512
HOP = 256
_FAN_OUT = 8          # targets per anchor
_MAX_DT = 127         # frames (7 bits)


def _frames(x: np.ndarray) -> np.ndarray:
    """(n_frames, N_FFT) overlapping view (no copy)."""
    n = (len(x) - N_FFT) // HOP + 1
    if n <= 0:
        return np.empty((0, N_FFT))
    return np.lib.stride_tricks.as_strided(
        x, shape=(n, N_FFT), strides=(x.strides[0] * HOP, x.strides[0]))


def audio_fingerprints(pcm: np.ndarray, *, n_peaks: int = 5,
                       landmark_arity: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Clip → (uint64 landmark hashes, int64 anchor frame indices).
    Deterministic; amplitude-invariant (peaks are per-frame ranks).

    ``landmark_arity`` picks the hash specificity — the corpus-dedup
    SCALE knob: shared-hash pair enumeration is inherently quadratic in
    mean hash occupancy, and occupancy = landmark instances / hash
    space. Arity 2 (Shazam's query shape, (f1, f2, dt), ~2 M effective
    combos) is right for lookup against an index; for ALL-PAIRS corpus
    dedup use arity 3 — (f1, f2, f3) across frames (i, i+dt, i+2dt)
    packed as 27+5 bits — whose cubed space keeps occupancy ~1, making
    the pair stage linear in corpus size (measured: tools/stress_audio).
    Higher arity trades per-landmark noise robustness (all three peaks
    must survive), covered by the match-count margin."""
    if landmark_arity not in (2, 3):
        raise ValueError(f"landmark_arity must be 2 or 3, got {landmark_arity}")
    x = pcm.astype(np.float64).reshape(pcm.shape[0], -1).mean(axis=1)
    fr = _frames(x)
    if len(fr) < 2:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    win = np.hanning(N_FFT)
    mag = np.abs(np.fft.rfft(fr * win[None, :], axis=1))  # (n, 257)
    # per-frame top-n_peaks bins above the frame median (skip DC)
    mag[:, 0] = 0.0
    med = np.median(mag, axis=1, keepdims=True)
    idx = np.argpartition(-mag, n_peaks, axis=1)[:, :n_peaks]  # (n, p)
    # argpartition's order within the top-p is ARBITRARY (and amplitude-
    # sensitive); sort the bins so position-aligned pairing below is
    # deterministic and requantization-stable
    idx = np.sort(idx, axis=1)
    ok = np.take_along_axis(mag, idx, axis=1) > med
    n = len(fr)
    # (anchor frame i, its peaks) × (target frame j in (i, i+_MAX_DT])
    hashes: list[np.ndarray] = []
    anchors: list[np.ndarray] = []
    # vectorize over the fan-out offsets: for each dt, pair frame i's
    # peaks with frame (i+dt)'s peaks elementwise (p×p would blow up;
    # rank-aligned pairing keeps _FAN_OUT·p hashes per frame)
    for k in range(1, _FAN_OUT + 1):
        dt = k * 3  # spread targets forward: 3, 6, ... 24 frames
        if dt > _MAX_DT or n - dt <= 0:
            break
        if landmark_arity == 2:
            f1 = idx[: n - dt]          # (m, p) anchor peak bins
            f2 = idx[dt:]               # (m, p) target peak bins
            valid = ok[: n - dt] & ok[dt:]
            h = ((f1.astype(np.uint64) << np.uint64(18))
                 | (f2.astype(np.uint64) << np.uint64(7))
                 | np.uint64(dt))
            t = np.broadcast_to(
                np.arange(n - dt, dtype=np.int64)[:, None], f1.shape)
        else:
            if n - 2 * dt <= 0:
                break
            f1 = idx[: n - 2 * dt]
            f2 = idx[dt: n - dt]
            f3 = idx[2 * dt:]
            valid = ok[: n - 2 * dt] & ok[dt: n - dt] & ok[2 * dt:]
            h = ((f1.astype(np.uint64) << np.uint64(23))
                 | (f2.astype(np.uint64) << np.uint64(14))
                 | (f3.astype(np.uint64) << np.uint64(5))
                 | np.uint64(dt))
            t = np.broadcast_to(
                np.arange(n - 2 * dt, dtype=np.int64)[:, None], f1.shape)
        hashes.append(h[valid])
        anchors.append(t[valid])
    if not hashes:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    return np.concatenate(hashes), np.concatenate(anchors)


def audio_neardup_candidates(ds, *, id_col: str = "media_id",
                             payload_col: str = "payload",
                             type_col: str = "media_type",
                             n_peaks: int = 5, min_matches: int = 12,
                             landmark_arity: int = 2,
                             max_ids_per_hash: int = 64,
                             num_fold_buckets: int = 256):
    """Near-duplicate audio pairs ``(id_a, id_b, matches, offset)``:
    ≥ ``min_matches`` landmark hashes agreeing at one consistent frame
    offset (see module docstring). WAV rows only (the codec boundary);
    non-audio rows are ignored."""
    import ray  # noqa: F401  (Dataset ops below)

    check_pow2(num_fold_buckets, "num_fold_buckets")

    def explode(batch: pa.Table):
        from changesetmd_ray.stages.codecs import wav_decode

        types = (batch[type_col].to_pylist()
                 if type_col in batch.column_names else ["audio"] * len(batch))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_h: list[np.ndarray] = []
        out_t: list[np.ndarray] = []
        out_id: list[np.ndarray] = []
        for i, (ty, p) in enumerate(zip(types, batch[payload_col].to_pylist())):
            if ty != "audio" or p is None:
                continue
            pcm, _ = wav_decode(p)
            h, t = audio_fingerprints(pcm, n_peaks=n_peaks,
                                       landmark_arity=landmark_arity)
            out_h.append(h)
            out_t.append(t)
            out_id.append(np.full(len(h), ids[i], np.int64))
        h = np.concatenate(out_h) if out_h else np.empty(0, np.uint64)
        t = np.concatenate(out_t) if out_t else np.empty(0, np.int64)
        di = np.concatenate(out_id) if out_id else np.empty(0, np.int64)
        fold = (splitmix64(h) & np.uint64(num_fold_buckets - 1)).astype(np.int64)
        return pa.table(
            {
                "__bucket": pa.array(fold),
                "h": pa.array(h.view(np.int64)),
                "t": pa.array(t),
                id_col: pa.array(di),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "offset": pa.array([], pa.int64())}
        )
        h = group["h"].to_numpy(zero_copy_only=False)
        t = group["t"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        h_s, t_s, id_s = h[order], t[order], ids[order]
        starts = np.concatenate(
            [[0], 1 + np.nonzero(np.diff(h_s))[0], [len(h_s)]]).astype(np.int64)
        out_a, out_b, out_d = [], [], []
        for a, b in zip(starts[:-1], starts[1:]):
            m = b - a
            if m < 2 or m > max_ids_per_hash:  # hot-landmark guard
                continue
            seg_id, seg_t = id_s[a:b], t_s[a:b]
            # all cross-id occurrence pairs of this hash
            ii, jj = np.triu_indices(int(m), k=1)
            keep = seg_id[ii] != seg_id[jj]
            if not keep.any():
                continue
            ii, jj = ii[keep], jj[keep]
            lo = seg_id[ii] < seg_id[jj]
            ia = np.where(lo, ii, jj)
            ib = np.where(lo, jj, ii)
            out_a.append(seg_id[ia])
            out_b.append(seg_id[ib])
            out_d.append(seg_t[ia] - seg_t[ib])
        if not out_a:
            return empty
        return pa.table(
            {"id_a": pa.array(np.concatenate(out_a)),
             "id_b": pa.array(np.concatenate(out_b)),
             "offset": pa.array(np.concatenate(out_d))}
        )

    def score(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "matches": pa.array([], pa.int64()), "offset": pa.array([], pa.int64())}
        )
        a = group["id_a"].to_numpy(zero_copy_only=False)
        b = group["id_b"].to_numpy(zero_copy_only=False)
        d = group["offset"].to_numpy(zero_copy_only=False)
        key = np.stack([a, b, d], axis=1)
        uk, cnt = np.unique(key, axis=0, return_counts=True)
        # best consistent offset per (a, b)
        pair = uk[:, :2]
        up, inv = np.unique(pair, axis=0, return_inverse=True)
        best = np.zeros(len(up), np.int64)
        best_off = np.zeros(len(up), np.int64)
        np.maximum.at(best, inv, cnt)
        is_best = cnt == best[inv]
        # first best offset per pair (deterministic: uk is sorted)
        seen = np.zeros(len(up), bool)
        for i in np.nonzero(is_best)[0]:
            g = inv[i]
            if not seen[g]:
                seen[g] = True
                best_off[g] = uk[i, 2]
        keep = best >= min_matches
        if not keep.any():
            return empty
        return pa.table(
            {"id_a": pa.array(up[keep, 0]), "id_b": pa.array(up[keep, 1]),
             "matches": pa.array(best[keep]), "offset": pa.array(best_off[keep])}
        )

    def tag_pair(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pb = (splitmix64(splitmix64(a) ^ b)
              & np.uint64(num_fold_buckets - 1)).astype(np.int64)
        return batch.append_column("__pb", pa.array(pb))

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    pairs = exploded.groupby("__bucket").map_groups(
        bucket_pairs, batch_format="pyarrow")
    return (pairs.map_batches(tag_pair, batch_format="pyarrow")
            .groupby("__pb")
            .map_groups(score, batch_format="pyarrow"))
