import io
import tarfile
from pathlib import Path

import numpy as np
import pytest

from syncfusion_tpu.data.prefetch import device_prefetch
from syncfusion_tpu.data.sfx_dataset import batched, collate, create_sfx_dataset
from syncfusion_tpu.data.shards import (
    decode_times_csv,
    expand_shards,
    iter_tar_samples,
    shard_for_process,
)
from syncfusion_tpu.ops.wav import write_wav

SR = 8000
CHUNK = 4000


def _make_shard(path: Path, tracks: dict[str, tuple[np.ndarray, list]]):
    """tracks: name -> (wav (1,T), [(time, label), ...])"""
    with tarfile.open(path, "w") as tf:
        for name, (wav, times) in tracks.items():
            buf = io.BytesIO()
            tmp = path.parent / f"{name.replace('/', '_')}.tmp.wav"
            write_wav(tmp, wav, SR)
            data = tmp.read_bytes()
            tmp.unlink()
            info = tarfile.TarInfo(f"{name}.resampled.wav")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            csv = "".join(f"{t},{lab}\n" for t, lab in times).encode()
            info = tarfile.TarInfo(f"{name}.times.csv")
            info.size = len(csv)
            tf.addfile(info, io.BytesIO(csv))


@pytest.fixture()
def shard(tmp_path):
    rng = np.random.default_rng(0)
    tracks = {}
    for i in range(3):
        wav = rng.normal(size=(1, SR * 2)).astype(np.float32) * 0.1  # 2 s
        times = [(0.25, "hit wood"), (0.8, "None"), (1.4, "scratch metal")]
        tracks[f"vid_{i}"] = (wav, times)
    p = tmp_path / "train_shard_1.tar"
    _make_shard(p, tracks)
    return p


def test_expand_shards_brace_and_list():
    assert expand_shards("s_{1..3}.tar") == ["s_1.tar", "s_2.tar", "s_3.tar"]
    assert expand_shards(["a.tar", "b.tar"]) == ["a.tar", "b.tar"]
    assert shard_for_process(["a", "b", "c", "d"], 1, 2) == ["b", "d"]


def test_decode_times_csv():
    md = decode_times_csv(b"0.25,hit wood\n0.8,None\n1.4\n")
    assert md[0.25] == "hit wood" and md[1.4] is None
    assert list(md.keys()) == [0.25, 0.8, 1.4]


def test_iter_tar_samples_groups_by_key(shard):
    samples = list(iter_tar_samples(shard))
    assert len(samples) == 3
    assert {"__key__", "resampled.wav", "times.csv"} <= set(samples[0].keys())


def test_sfx_dataset_chunks_and_onsets(shard):
    items = list(
        create_sfx_dataset(
            str(shard), sample_rate=SR, chunk_size=CHUNK,
            cut_prefix=True, one_chunk_per_track=False, seed=1,
        )
    )
    # 2 s tracks at 8 kHz = 16000 samples → 4 chunks of 4000; chunks with an
    # onset inside: chunk0 (0.25s), chunk1 (0.8s... wait 0.8s=6400 → chunk1),
    # chunk2 (1.4s=11200), chunk3 has none → 3 chunks per track
    assert len(items) == 9
    it = items[0]
    assert it.wav.shape == (1, CHUNK) and it.onsets.shape == (1, CHUNK)
    # cut_prefix zeroed everything before the first onset
    first = int(np.nonzero(it.onsets[0])[0][0])
    assert np.all(it.wav[:, :first] == 0.0)
    assert it.onsets[0, first] == 1.0
    assert it.text in ("hit wood", "scratch metal")  # 'None' labels skipped


def test_sfx_dataset_one_chunk_per_track(shard):
    items = list(
        create_sfx_dataset(
            str(shard), sample_rate=SR, chunk_size=CHUNK,
            one_chunk_per_track=True, seed=1,
        )
    )
    assert len(items) == 3
    assert len({it.filename for it in items}) == 3


def test_sfx_dataset_resamples(shard):
    items = list(
        create_sfx_dataset(
            str(shard), sample_rate=4000, chunk_size=2000,
            one_chunk_per_track=True, seed=0,
        )
    )
    assert items and items[0].wav.shape == (1, 2000)


def test_shift_augment_determinism(shard):
    a = [
        it.wav for it in create_sfx_dataset(
            str(shard), SR, CHUNK, shift_augment=True, one_chunk_per_track=True, seed=7)
    ]
    b = [
        it.wav for it in create_sfx_dataset(
            str(shard), SR, CHUNK, shift_augment=True, one_chunk_per_track=True, seed=7)
    ]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_collate_pads_cond(shard):
    items = list(
        create_sfx_dataset(str(shard), SR, CHUNK, one_chunk_per_track=False, seed=0)
    )[:4]
    batch = collate(items)
    assert batch["wav"].shape == (4, CHUNK, 1)
    assert batch["onsets"].shape == (4, CHUNK, 1)
    assert batch["cond"].shape[0] == 4 and batch["cond"].shape[2] == 1
    assert len(batch["text"]) == 4


def test_batched_with_shuffle(shard):
    batches = list(
        batched(
            create_sfx_dataset(str(shard), SR, CHUNK, one_chunk_per_track=False, seed=0),
            batch_size=4, shuffle_size=8, seed=3,
        )
    )
    total = sum(b["wav"].shape[0] for b in batches)
    assert total == 9


def test_device_prefetch(shard):
    import jax

    stream = batched(
        create_sfx_dataset(str(shard), SR, CHUNK, one_chunk_per_track=False, seed=0),
        batch_size=4, drop_last=True,
    )

    def strip(b):
        return {"wav": b["wav"], "onsets": b["onsets"]}

    got = list(device_prefetch(stream, transform=strip))
    assert len(got) == 2
    assert isinstance(got[0]["wav"], jax.Array)


def test_device_prefetch_propagates_errors():
    def bad():
        yield {"x": np.ones(3)}
        raise RuntimeError("boom")

    it = device_prefetch(bad())
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_text_drawn_once_per_track(shard):
    """Reference picks ONE random label per track BEFORE the chunk loop
    (dataset_diffusion.py:59-65) — all chunks of a track share it."""
    items = list(
        create_sfx_dataset(
            str(shard), sample_rate=SR, chunk_size=CHUNK,
            cut_prefix=True, one_chunk_per_track=False, seed=3,
        )
    )
    per_track = {}
    for it in items:
        per_track.setdefault(it.filename, set()).add(it.text)
    assert len(per_track) == 3
    for name, texts in per_track.items():
        assert len(texts) == 1, f"{name} got {texts} — text must be per-track"
    # across seeds the draw actually varies (it is random, not first-label)
    seen = set()
    for seed in range(8):
        its = list(create_sfx_dataset(str(shard), sample_rate=SR,
                                      chunk_size=CHUNK, seed=seed))
        seen.update(it.text for it in its)
    assert seen == {"hit wood", "scratch metal"}
