"""Deterministic synthetic (image, caption) corpus with planted near-dups.

Mirrors the reference's evaluation hook: the NC-Voters dataset carries
author-injected duplicates sharing a `recid`, produced by character
removal / replacement / reversal plus unmodified re-insertion
(/root/reference/01_Prepare_Data.py:233-235).  We plant the same four
corruption classes on (image, caption) records and emit ground-truth
`truth_pairs` so dup-pair recall is measurable offline:

    a) exact re-insertion            (new image_id, same bytes+caption)
    b) caption typos only            (char removal/replacement/swap)
    c) pixel noise below PSNR budget (+ re-encode, possibly new fmt)
    d) both b and c

Also splits 4/5 into `images_initial` and 1/5 into `images_incremental`
(mirrors /root/reference/01_Prepare_Data.py:117-129).

All randomness flows from one numpy Generator(seed) — same seed, same bytes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from customer_er_spark import codecs, phash

def _build_vocab(n_words: int = 4000, seed: int = 1234) -> list[str]:
    """Seeded random 4-9 letter words.  Natural-language realism matters for
    LSH behavior: unrelated captions must share few character shingles.
    (Earlier vocabs built from shared prefix/suffix stems made every caption
    pair ~0.3-Jaccard similar and candidate volume quadratic — no real
    caption corpus behaves that way.)"""
    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    # zipf-ish length distribution, rejection-free dedup via suffix counter
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n_words:
        ln = int(rng.integers(4, 10))
        w = "".join(letters[rng.integers(0, 26, ln)])
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


_VOCAB = _build_vocab()
_FMTS = ["png", "raw", "qpng"]


def _make_image(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Natural-image stand-in: box-blurred white noise (1/f-ish spectrum)
    + a few sinusoids + a random gradient, uint8 grayscale.

    The blurred-noise base is what gives the pHash near-uniform, weakly
    correlated bits (pure sinusoid mixtures produced heavily correlated
    DCT signs — hot pHash LSH buckets no natural photo corpus would show).
    """
    noise = rng.normal(0, 1, (h + 8, w + 8))
    k = np.ones(5) / 5.0
    sm = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, noise)
    sm = np.apply_along_axis(lambda c: np.convolve(c, k, mode="same"), 0, sm)
    sm = sm[4:4 + h, 4:4 + w]
    img = 60.0 * sm / max(float(sm.std()), 1e-9)

    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(int(rng.integers(2, 6))):
        fy, fx = rng.uniform(0.02, 0.25, 2)
        ph = rng.uniform(0, 2 * np.pi)
        img += rng.uniform(10, 30) * np.sin(2 * np.pi * (fy * yy + fx * xx) + ph)
    gy, gx = rng.uniform(-1, 1, 2)
    img += 20.0 * (gy * yy / max(h - 1, 1) + gx * xx / max(w - 1, 1))
    img = 128 + img * 0.6
    return np.clip(img, 0, 255).astype(np.uint8)


def _caption(rng: np.random.Generator) -> str:
    """5-30 vocab words plus two high-entropy tokens.  Natural captions are
    near-unique across unrelated images; without the entropy tokens every
    caption shares most 5-char shingles with every other (200-word vocab)
    and LSH candidate volume degenerates to O(n^2), which no real corpus
    exhibits.  Planted duplicates still copy the full caption, so true-pair
    Jaccard stays high."""
    n = int(rng.integers(5, 31))
    words = [_VOCAB[i] for i in rng.integers(0, len(_VOCAB), n)]
    words.insert(int(rng.integers(0, len(words))), f"x{int(rng.integers(0, 10**9)):09d}")
    words.append(f"k{int(rng.integers(0, 10**9)):09d}")
    return " ".join(words)


def _typo_caption(rng: np.random.Generator, caption: str, n_typos: int = 2) -> str:
    chars = list(caption)
    for _ in range(n_typos):
        if len(chars) < 4:
            break
        op = int(rng.integers(0, 3))
        i = int(rng.integers(1, len(chars) - 2))
        if op == 0:  # removal
            del chars[i]
        elif op == 1:  # replacement
            chars[i] = chr(ord("a") + int(rng.integers(0, 26)))
        else:  # reversal (swap adjacent)
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
    return "".join(chars)


def _noisy_image(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Additive integer noise in [-2, 2] -> PSNR ~ 47dB vs original."""
    noise = rng.integers(-2, 3, img.shape)
    return np.clip(img.astype(np.int32) + noise, 0, 255).astype(np.uint8)


def generate(
    n_base: int = 800,
    dup_fraction: float = 0.25,
    seed: int = 42,
    img_hw: tuple[int, int] = (32, 32),
) -> tuple[list[dict], list[dict]]:
    """Returns (rows, truth_pairs); rows have the BASELINE.json input_hint schema."""
    rng = np.random.default_rng(seed)
    h, w = img_hw
    rows: list[dict] = []
    groups: dict[int, list[str]] = {}

    def add_row(img: np.ndarray, caption: str, fmt: str, group: int) -> None:
        rid = len(rows)
        image_id = f"img_{rid:08d}"
        data = codecs.encode(img, fmt)
        ph = phash.phash64(codecs.decode(data, fmt))  # hash what's stored
        rows.append(
            {
                "image_id": image_id,
                "bytes": data,
                "w": int(img.shape[1]),
                "h": int(img.shape[0]),
                "fmt": fmt,
                "caption": caption,
                "phash": int(ph),
            }
        )
        groups.setdefault(group, []).append(image_id)

    base_imgs: list[np.ndarray] = []
    base_caps: list[str] = []
    for g in range(n_base):
        img = _make_image(rng, h, w)
        cap = _caption(rng)
        base_imgs.append(img)
        base_caps.append(cap)
        add_row(img, cap, _FMTS[g % len(_FMTS)], g)

    n_dups = int(n_base * dup_fraction)
    for _ in range(n_dups):
        g = int(rng.integers(0, n_base))
        img, cap = base_imgs[g], base_caps[g]
        variant = int(rng.integers(0, 4))
        fmt = _FMTS[int(rng.integers(0, len(_FMTS)))]
        if variant == 0:  # exact re-insert
            add_row(img, cap, fmt, g)
        elif variant == 1:  # caption typos only
            add_row(img, _typo_caption(rng, cap), fmt, g)
        elif variant == 2:  # pixel noise only
            add_row(_noisy_image(rng, img), cap, fmt, g)
        else:  # both
            add_row(_noisy_image(rng, img), _typo_caption(rng, cap), fmt, g)

    truth: list[dict] = []
    for g, members in groups.items():
        if len(members) < 2:
            continue
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                truth.append({"id_l": members[i], "id_r": members[j], "group_id": g})
    return rows, truth


_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def write_corpus(
    out_dir: str,
    n_base: int = 800,
    dup_fraction: float = 0.25,
    seed: int = 42,
    img_hw: tuple[int, int] = (32, 32),
) -> dict:
    """Write images.parquet / images_initial.parquet / images_incremental.parquet
    / truth_pairs.parquet under out_dir; returns summary counts."""
    os.makedirs(out_dir, exist_ok=True)
    rows, truth = generate(n_base, dup_fraction, seed, img_hw)
    table = pa.Table.from_pylist(rows, schema=_SCHEMA)
    pq.write_table(table, os.path.join(out_dir, "images.parquet"))
    # 4/5 initial, 1/5 incremental, deterministic by row index
    cut = int(len(rows) * 0.8)
    pq.write_table(table.slice(0, cut), os.path.join(out_dir, "images_initial.parquet"))
    pq.write_table(table.slice(cut), os.path.join(out_dir, "images_incremental.parquet"))
    tschema = pa.schema([("id_l", pa.string()), ("id_r", pa.string()), ("group_id", pa.int64())])
    pq.write_table(
        pa.Table.from_pylist(truth, schema=tschema),
        os.path.join(out_dir, "truth_pairs.parquet"),
    )
    return {"rows": len(rows), "truth_pairs": len(truth), "initial": cut,
            "incremental": len(rows) - cut, "dir": out_dir}


if __name__ == "__main__":
    import json
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/images_small"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    print(json.dumps(write_corpus(out, n_base=n)))
