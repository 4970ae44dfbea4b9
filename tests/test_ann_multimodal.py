import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawlkit import imagecodec
from crawlkit.pipelines import ann, multimodal



def _pdf(res):
    import pandas as _pd
    return res if isinstance(res, _pd.DataFrame) else res.to_pandas()

SF_DIR = "/root/testdata/sf0.001"


def _brute_topk(sf_dir, k=10, every=50):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    emb = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    emb /= np.maximum(np.linalg.norm(emb, axis=1), 1e-12)[:, None]
    qm = ids % every == 0
    out = {}
    sims = emb[qm] @ emb.T
    for row, qid in enumerate(ids[qm]):
        order = sorted(
            [(s, n) for s, n in zip(sims[row], ids) if n != qid],
            key=lambda t: (-t[0], t[1]),
        )[:k]
        out[qid] = [n for _, n in order]
    return out


def test_knn_bruteforce_matches_numpy():
    got = ann.knn_bruteforce(SF_DIR, k=10).to_pandas()
    want = _brute_topk(SF_DIR, k=10)
    for qid, grp in got.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert grp["neighbor_id"].tolist() == want[qid]


def test_knn_ivf_recall():
    got = ann.knn_ivf(SF_DIR, k=10).to_pandas()
    want = _brute_topk(SF_DIR, k=10)
    recalls = []
    for qid, grp in got.groupby("query_id"):
        recalls.append(len(set(grp["neighbor_id"]) & set(want[qid])) / 10)
    # r3 sweep at sf0.01 (clusterless gaussian vectors — the hard case;
    # within-label cos 0.02): nprobe 4/6/8 of nlist 16 → 0.65/0.75/0.85
    # mean recall, deterministic (fixed seeds). Default nprobe=8 → 0.7
    # bar with margin; recall here is geometry-bound, not centroid-bound
    assert np.mean(recalls) >= 0.7


def test_image_features_real_decode():
    feats = multimodal.image_features(n=16).to_pandas().set_index("image_id")
    assert len(feats) == 16
    from crawlkit.synthweb import SynthWeb

    web = SynthWeb("t1")
    for iid in feats.index[:4]:
        px = imagecodec.decode(web.image_record(iid)["bytes"])
        assert feats.loc[iid, "w"] == px.shape[1]
        assert feats.loc[iid, "h"] == px.shape[0]
        thumb = imagecodec.decode_png(feats.loc[iid, "thumb"])
        assert thumb.shape == (16, 16, 3)


def test_image_phash_neardup_pipeline_runs():
    pairs = _pdf(multimodal.image_phash_neardup(n=32, max_hamming=30))
    # deterministic output; pairs symmetric-free (a < b by construction of ids)
    again = _pdf(multimodal.image_phash_neardup(n=32, max_hamming=30))
    pd.testing.assert_frame_equal(
        pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True),
        again.sort_values(["id_a", "id_b"]).reset_index(drop=True),
    )


def test_video_frame_sample_legacy_container():
    import struct

    frames = [imagecodec.encode_png(np.full((4, 4, 3), i, dtype=np.uint8)) for i in range(7)]
    blob = struct.pack(">I", len(frames)) + b"".join(
        struct.pack(">I", len(f)) + f for f in frames
    )
    t = pa.table({"video_id": ["v1"], "bytes": [blob]})
    out = multimodal.VideoFrameSample(every_k=3)(t)
    assert out["frame_idx"].to_pylist() == [0, 3, 6]
    px = imagecodec.decode_png(out["frame_png"].to_pylist()[1])
    assert (px == 3).all()


def test_avi_codec_roundtrip():
    from crawlkit import videocodec

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(9, 7, 3)).astype(np.uint8) for _ in range(4)]
    data = videocodec.avi_encode(frames, fps=10)
    got, fps = videocodec.avi_decode(data)
    assert fps == 10 and len(got) == 4
    for a, b in zip(frames, got):
        assert (a == b).all()
    with pytest.raises(ValueError):
        videocodec.avi_decode(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):  # truncated strf → ValueError, not struct.error
        videocodec.avi_decode(data[:40])


def test_video_frame_sample_real_avi():
    """Real RIFF-AVI demux: sampled frames decode to the exact source
    pixels; a garbage payload yields the frame_idx=-1 error row."""
    from crawlkit import videocodec

    base = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    frames = [np.roll(base, f, axis=1) for f in range(7)]
    t = pa.table(
        {
            "video_id": ["v1", "bad"],
            "bytes": [videocodec.avi_encode(frames, fps=10), b"RIFF\x00\x00\x00\x00JUNK"],
        }
    )
    out = multimodal.VideoFrameSample(every_k=3)(t).to_pandas()
    v1 = out[out.video_id == "v1"]
    assert v1["frame_idx"].tolist() == [0, 3, 6]
    for _, row in v1.iterrows():
        px = imagecodec.decode_png(row["frame_png"])
        assert (px == np.roll(base, int(row["frame_idx"]), axis=1)).all()
    assert out[out.video_id == "bad"]["frame_idx"].tolist() == [-1]


def test_video_frames_query_runs():
    out = multimodal.video_frame_sample("unused", n=6, every_k=3).to_pandas()
    assert (out["frame_idx"] >= 0).all() and len(out) >= 6
    assert set(out["video_id"]).issuperset({f"vid-mm-{i}" for i in range(6)})


def test_video_phash_neardup_planted():
    """Planted -dup videos (same frames minus the last) pair with their
    base exactly once; distinct videos never pair; deterministic."""
    out = multimodal.video_phash_neardup("unused", n=10, plant_pairs=3)
    got = sorted(zip(out["id_a"], out["id_b"]))
    assert got == [(f"vid-mm-{i}", f"vid-mm-{i}-dup") for i in range(3)], got
    assert (out["jaccard_milli"] >= 500).all()
    again = multimodal.video_phash_neardup("unused", n=10, plant_pairs=3)
    assert sorted(zip(again["id_a"], again["id_b"])) == got


def test_video_phash_neardup_degenerate_bucket_capped():
    """A viral frame shared by > bucket_cap videos must NOT go
    quadratic: its bucket is skipped entirely (videos sharing ONLY that
    frame emit no pairs), while dup pairs are still found through their
    rarer frames — the minhash_lsh_pairs hot-bucket hatch applied to
    the shared-frame grouping."""
    from crawlkit import videocodec

    rng = np.random.default_rng(7)
    viral = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    rows_id, rows_bytes = [], []
    # 20 videos whose ONLY frame is the viral one (bucket size 20 > cap 8)
    for i in range(20):
        rows_id.append(f"viral-{i}")
        rows_bytes.append(videocodec.avi_encode([viral], fps=10))
    # 2 dup pairs: viral frame + a rare per-pair frame
    for i in range(2):
        rare = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        for suffix in ("", "-dup"):
            rows_id.append(f"pair-{i}{suffix}")
            rows_bytes.append(videocodec.avi_encode([viral, rare], fps=10))
    import ray.data as rd

    src = rd.from_arrow(
        pa.table({"video_id": pa.array(rows_id), "bytes": pa.array(rows_bytes, pa.binary())})
    )
    out = multimodal.video_phash_neardup(
        "unused", bucket_cap=8, tau_milli=500, source=src
    )
    got = sorted(zip(out["id_a"], out["id_b"]))
    # no viral-only pair survives (capped bucket skipped); both planted
    # pairs found via their rare frame, jaccard exact (2 shared / 2 union)
    assert got == [("pair-0", "pair-0-dup"), ("pair-1", "pair-1-dup")], got
    assert (out["jaccard_milli"] == 1000).all()


def test_video_scene_cuts_planted():
    """Planted inversion cuts (every 3rd video, at nframes//2) are
    detected exactly; rolling-motion frames never trigger."""
    out = multimodal.video_scene_cuts("unused", n=12).to_pandas()
    assert (out["frame_idx"] > 0).all()  # all payloads decodable
    for i in range(12):
        v = out[out.video_id == f"vid-mm-{i}"]
        cuts = v[v.is_cut]["frame_idx"].tolist()
        nframes = 4 + (i % 5)
        assert cuts == ([nframes // 2] if i % 3 == 0 else []), (i, cuts)


def test_avi_mjpeg_roundtrip():
    """Motion-JPEG AVI: '00dc' chunks of real baseline JFIF frames.
    Round-trip preserves count/fps/shape; PSNR bounded even on noise;
    a frame's chunk decodes standalone with the plain JPEG decoder."""
    from crawlkit import videocodec
    from crawlkit.jpegcodec import decode_jpeg

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(24, 32, 3)).astype(np.uint8)
    frames = [np.roll(base, 2 * f, axis=1) for f in range(5)]
    data = videocodec.avi_encode(frames, fps=8, codec="mjpeg", quality=98)
    got, fps = videocodec.avi_decode(data)
    assert fps == 8 and len(got) == 5 and got[0].shape == (24, 32, 3)
    for a, b in zip(frames, got):
        assert imagecodec.psnr(a, b) >= 35.0  # pure noise, q98
    # frames are INDEPENDENT JFIF streams (the MJPEG interchange
    # property): pull the first '00dc' chunk and decode it alone
    i = data.index(b"00dc")
    (ln,) = np.frombuffer(data[i + 4 : i + 8], dtype="<u4")
    standalone = decode_jpeg(data[i + 8 : i + 8 + int(ln)])
    assert (standalone == got[0]).all()
    with pytest.raises(ValueError):
        videocodec.avi_encode(frames, codec="h264")


def test_video_ops_over_mjpeg_corpus():
    """The pipeline ops run unchanged over the compressed corpus:
    planted cuts are still found exactly (jpeg noise stays under the
    MAD threshold) and planted near-dup pairs still pair (same codec →
    identical frames → identical phashes)."""
    out = multimodal.video_scene_cuts("unused", n=9, codec="mjpeg").to_pandas()
    assert (out["frame_idx"] > 0).all()
    for i in range(9):
        v = out[out.video_id == f"vid-mm-{i}"]
        cuts = v[v.is_cut]["frame_idx"].tolist()
        nframes = 4 + (i % 5)
        assert cuts == ([nframes // 2] if i % 3 == 0 else []), (i, cuts)
    nd = multimodal.video_phash_neardup("unused", n=8, plant_pairs=2, codec="mjpeg")
    got = sorted(zip(nd["id_a"], nd["id_b"]))
    assert got == [(f"vid-mm-{i}", f"vid-mm-{i}-dup") for i in range(2)], got


def test_wav_codec_roundtrip():
    from crawlkit import audiocodec

    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, size=1234).astype(np.int16)
    data = audiocodec.wav_encode(x, 12000)
    y, rate = audiocodec.wav_decode(data)
    assert rate == 12000 and (y == x).all()
    with pytest.raises(ValueError):
        audiocodec.wav_decode(b"not a riff stream")
    # truncated chunk and zero-rate headers must raise the DOCUMENTED
    # ValueError (not struct.error / ZeroDivisionError downstream), so
    # the stages' error-row convention holds for any corrupt payload
    with pytest.raises(ValueError):
        audiocodec.wav_decode(data[:20])
    with pytest.raises(ValueError):
        audiocodec.wav_decode(audiocodec.wav_encode(x, 0))
    import struct as _s

    bad_fmt = b"RIFF" + _s.pack("<I", 16) + b"WAVE" + b"fmt " + _s.pack("<I", 4) + b"\x01\x00\x01\x00"
    with pytest.raises(ValueError):
        audiocodec.wav_decode(bad_fmt)


def test_audio_features_match_numpy_brute():
    """Engine features ≡ direct numpy over the decoded corpus; non-PCM
    rows get the duration_ms=-1 error row instead of failing."""
    import math

    from crawlkit import audiocodec

    corpus = multimodal.synthetic_audio(12).to_pandas()
    out = (
        multimodal.audio_features("unused", n=12)
        .to_pandas()
        .set_index("audio_id")
    )
    clipped = 0
    for _, row in corpus.iterrows():
        x, rate = audiocodec.wav_decode(row["bytes"])
        xi = x.astype(np.int64)
        r = out.loc[row["audio_id"]]
        assert r["sample_rate"] == rate
        assert r["duration_ms"] == len(xi) * 1000 // rate
        assert r["rms"] == math.isqrt(int((xi * xi).sum()) // len(xi))
        assert r["peak"] == np.abs(xi).max()
        assert r["zero_crossings"] == ((xi[1:] >= 0) != (xi[:-1] >= 0)).sum()
        clipped += int(r["clipped_frac_milli"] > 0)
    assert len(out) == 12 and clipped >= 1  # fixture plants clipped rows

    bad = multimodal.AudioFeatures()(
        pa.table({"audio_id": ["a"], "bytes": [b"\x00\x01garbage"]})
    )
    assert bad["duration_ms"].to_pylist() == [-1]


def test_audio_segments_planted_silence():
    """Rows with the planted mid-row silence split into ≥2 segments;
    always-active rows give exactly 1 full-length segment; segment
    windows are exactly the rms>=tau run-lengths (brute check on one)."""
    import math

    from crawlkit import audiocodec
    from crawlkit.hashing import hash64_np

    corpus = multimodal.synthetic_audio(16).to_pandas().set_index("audio_id")
    out = multimodal.audio_segments("unused", n=16).to_pandas()
    planted = saw_one = False
    for aid in corpus.index:
        h = int(hash64_np(np.array([aid], dtype=object))[0])
        segs = out[out.audio_id == aid]
        if h % 5 == 0:
            assert len(segs) >= 2, (aid, len(segs))
            planted = True
        else:
            assert len(segs) == 1, (aid, len(segs))
            saw_one = True
    assert planted and saw_one

    aid = out.iloc[0]["audio_id"]
    x, rate = audiocodec.wav_decode(corpus.loc[aid]["bytes"])
    win = rate * 20 // 1000
    nwin = len(x) // win
    sq = (x[: nwin * win].astype(np.int64) ** 2).reshape(nwin, win)
    rms = np.array([math.isqrt(int(s) // win) for s in sq.sum(axis=1)])
    assert int(out[out.audio_id == aid]["n_windows"].sum()) == int((rms >= 500).sum())


def test_image_phash_neardup_planted_pairs():
    """plant_pairs seeds LSB-perturbed near-dup images: the pipeline
    must find every planted pair (non-vacuous driver fixture)."""
    pairs = _pdf(multimodal.image_phash_neardup(n=16, max_hamming=10, plant_pairs=3))
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert {(f"img-mm-{i}", f"img-mm-{i}-dup") for i in range(3)} <= got


def test_image_resize_pipeline():
    """Resize stage: output PNG decodes at the target shape and equals a
    driver-side box_resize of the same source (byte-deterministic)."""
    from crawlkit.synthweb import SynthWeb

    out = multimodal.image_resize(n=8, out_h=24, out_w=24).to_pandas().set_index("image_id")
    assert len(out) == 8
    web = SynthWeb("t1")
    for iid in list(out.index)[:3]:
        px = imagecodec.decode(web.image_record(iid)["bytes"])
        got = imagecodec.decode_png(out.loc[iid, "bytes"])
        assert got.shape == (24, 24, 3)
        assert np.array_equal(got, imagecodec.box_resize(px, 24, 24))
        assert out.loc[iid, "src_h"] == px.shape[0]


def test_image_dedup_exact_planted_copies():
    """Exact content-digest dedup finds exactly the planted byte-copies:
    brute-force oracle = driver-side digest of the same synthetic set."""
    got = _pdf(multimodal.image_dedup_exact(n=24, plant_copies=5))
    got = got.sort_values("image_id").reset_index(drop=True)
    # oracle: every planted group is (img-mm-i, img-mm-i-copy) — the
    # min id is the base, n_copies == 2; no other collisions exist
    assert list(got["image_id"]) == [f"img-mm-{i}" for i in sorted(range(5), key=str)]
    assert (got["n_copies"] == 2).all()


def test_image_dedup_exact_no_copies_empty():
    got = _pdf(multimodal.image_dedup_exact(n=12, plant_copies=0))
    assert len(got) == 0 and list(got.columns) == ["image_id", "n_copies"]


def test_image_features_hash_columns():
    """ahash/dhash columns match the codec functions on decoded pixels."""
    from crawlkit.synthweb import SynthWeb

    feats = multimodal.image_features(n=6).to_pandas().set_index("image_id")
    web = SynthWeb("t1")
    for iid in list(feats.index)[:3]:
        px = imagecodec.decode(web.image_record(iid)["bytes"])
        assert feats.loc[iid, "ahash"] == np.int64(np.uint64(imagecodec.ahash64(px)))
        assert feats.loc[iid, "dhash"] == np.int64(np.uint64(imagecodec.dhash64(px)))


def test_image_histogram_sums_to_pixel_count():
    """Σ bins == w·h per image, and bins match a driver-side recompute
    of the same integer-luma binning (byte-deterministic)."""
    from crawlkit.synthweb import SynthWeb

    out = multimodal.image_histogram(n=8).to_pandas().set_index("image_id")
    assert len(out) == 8
    bins = [f"bin{i}" for i in range(multimodal.HIST_BINS)]
    assert (out[bins].sum(axis=1) == out["n_px"]).all()
    web = SynthWeb("t1")
    for iid in list(out.index)[:3]:
        rec = web.image_record(iid)
        px = imagecodec.decode(rec["bytes"], rec["fmt"]).astype(np.int64)
        luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
        want = np.bincount(
            (luma.ravel() * multimodal.HIST_BINS // 256).clip(0, multimodal.HIST_BINS - 1),
            minlength=multimodal.HIST_BINS,
        )
        assert list(out.loc[iid, bins]) == list(want)
        assert out.loc[iid, "n_px"] == luma.size


def test_caption_filter_matches_predicate_oracle():
    """caption_filter ≡ a driver-side recompute of the same predicate
    over the same synthetic table (and never touches bytes)."""
    import re

    got = multimodal.caption_filter(n=32, min_tokens=3).to_pandas()
    src = multimodal.synthetic_images(32).to_pandas()
    want = []
    for _, r in src.iterrows():
        n_tok = len(re.findall(r"\S+", r["caption"]))
        n_alpha = len(re.findall("[A-Za-z]", r["caption"]))
        if n_tok >= 3 and n_alpha * 100 >= len(r["caption"]) * 50:
            want.append((r["image_id"], n_tok))
    assert sorted(zip(got["image_id"], got["n_cap_tokens"])) == sorted(want)
    assert "bytes" not in got.columns


def test_image_patchify_reconstructs():
    """Patch rows reassemble to the original pixels (crop to the patch
    grid), and patch count == floor(w/P)·floor(h/P) per image."""
    import numpy as np

    from crawlkit.synthweb import SynthWeb

    p = 16
    rows = _pdf(multimodal.image_patchify(n=8, patch=p))
    web = SynthWeb("t1")
    for iid, grp in rows.groupby("image_id"):
        px = imagecodec.decode(web.image_record(iid)["bytes"])
        ny, nx = px.shape[0] // p, px.shape[1] // p
        assert len(grp) == ny * nx
        rec = np.zeros((ny * p, nx * p, 3), dtype=np.uint8)
        for _, r in grp.iterrows():
            tile = np.frombuffer(r["patch"], dtype=np.uint8).reshape(p, p, 3)
            rec[r["py"] * p : (r["py"] + 1) * p, r["px"] * p : (r["px"] + 1) * p] = tile
        assert np.array_equal(rec, px[: ny * p, : nx * p])
        # mean_milli matches the numpy mean of the tile
        r0 = grp.iloc[0]
        tile0 = np.frombuffer(r0["patch"], dtype=np.uint8).reshape(-1)
        assert r0["mean_milli"] == int(np.floor(tile0.mean(dtype=np.float64) * 1000))


def test_image_channel_stats_match_numpy():
    from crawlkit.synthweb import SynthWeb

    stats = _pdf(multimodal.image_channel_stats(n=8)).set_index(["image_id", "channel"])
    web = SynthWeb("t1")
    import numpy as np

    for iid in ["img-mm-0", "img-mm-5"]:
        px = imagecodec.decode(web.image_record(iid)["bytes"]).reshape(-1, 3).astype(np.int64)
        for c, j in (("r", 0), ("g", 1), ("b", 2)):
            row = stats.loc[(iid, c)]
            assert row["n"] == px.shape[0]
            assert row["s"] == px[:, j].sum()
            assert row["ss"] == (px[:, j] ** 2).sum()
            assert row["mn"] == px[:, j].min()
            assert row["mx"] == px[:, j].max()


def test_image_corpus_norm_is_global_reduce():
    """corpus_norm == the pandas reduce of channel_stats (merge law)."""
    per = _pdf(multimodal.image_channel_stats(n=8))
    glob = _pdf(multimodal.image_corpus_norm(n=8)).set_index("channel")
    want = per.groupby("channel").agg(
        n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"), mn=("mn", "min"), mx=("mx", "max")
    )
    for c in ["r", "g", "b"]:
        for col in ["n", "s", "ss", "mn", "mx"]:
            assert glob.loc[c, col] == want.loc[c, col], (c, col)


def test_image_verify_all_pass_and_detects_corruption():
    """Every synthetic row verifies (exact for png, PSNR≥40dB for the
    lossy stand-in, caption + phash equal); a corrupted row is caught."""
    import numpy as np
    import pyarrow as pa

    out = _pdf(multimodal.image_verify(n=16)).set_index("image_id")
    assert len(out) == 16
    assert out["pixels_ok"].all() and out["caption_ok"].all() and out["phash_ok"].all()
    # lossy rows went through the PSNR path, lossless the exact path
    assert out["pixels_exact"].any()
    lossy = out.loc[~out["pixels_exact"]]
    assert len(lossy) > 0 and (lossy["psnr_milli"] >= 40_000).all()

    # corrupt one row: wrong caption + perturbed pixels re-encoded
    from crawlkit.pipelines.multimodal import ImageVerify
    from crawlkit.synthweb import SynthWeb
    from crawlkit import imagecodec
    from crawlkit.stages.fetch import IMAGES_SCHEMA

    web = SynthWeb("t1")
    rec = dict(web.image_record("img-mm-3"))
    px = imagecodec.decode(rec["bytes"], rec["fmt"]).copy()
    px[: px.shape[0] // 2] = 0  # destroy half the image (PSNR ≪ 40)
    rec.update(bytes=imagecodec.encode_png(px), fmt="png", caption="WRONG")
    verdict = ImageVerify()(pa.Table.from_pylist([rec], schema=IMAGES_SCHEMA)).to_pylist()[0]
    assert not verdict["pixels_ok"] and not verdict["caption_ok"]
    assert 0 <= verdict["psnr_milli"] < 40_000


def test_image_verify_over_crawl_store(ray_session, tmp_path):
    """The SAME verify stage validates a crawl run's stored image rows
    end-to-end (run_crawl → images table → ImageVerify): the north-star
    invariant holds for every row the engine persisted."""
    import ray.data as rd

    from crawlkit.pipelines.crawl import run_crawl
    from crawlkit.pipelines.multimodal import ImageVerify
    from crawlkit.refsim import CrawlSpec

    res = run_crawl(
        "t1", spec=CrawlSpec(host_budget_per_round=16),
        out_dir=str(tmp_path / "verify_store"), num_seen_shards=2, fetch_concurrency=2,
    )
    images = res.images_table()
    assert images.num_rows > 0
    out = (
        rd.from_arrow(images)
        .map_batches(ImageVerify, batch_format="pyarrow", batch_size=8,
                     concurrency=2, max_restarts=0)
        .to_pandas()
    )
    assert len(out) == images.num_rows
    assert out["pixels_ok"].all() and out["caption_ok"].all() and out["phash_ok"].all()


def test_knn_ivfpq_recall_and_compression():
    """IVF-PQ: ADC candidate scan over 8-byte codes + exact re-rank.
    Deterministic recall (fixed seeds): measured 0.86 mean at sf0.001,
    0.85 at sf0.01 — pin ≥ 0.8. The normalized-before-Lloyd training
    also explains why this beats plain knn_ivf's 0.7 bar: list geometry
    matches the (normalized) query geometry."""
    got = ann.knn_ivfpq(SF_DIR, k=10).to_pandas()
    want = _brute_topk(SF_DIR, k=10)
    recalls = []
    for qid, grp in got.groupby("query_id"):
        recalls.append(len(set(grp["neighbor_id"]) & set(want[qid])) / 10)
    assert np.mean(recalls) >= 0.8
    # code width: 64-dim float32 (256 B) → m=8 uint8 codes (8 B) = 32×
    from crawlkit.pipelines.ann import _sample_embeddings, _train_pq

    books = _train_pq(
        _sample_embeddings(SF_DIR)[:256] /
        np.maximum(np.linalg.norm(_sample_embeddings(SF_DIR)[:256], axis=1), 1e-12)[:, None],
        m=8, nbits=4,
    )
    assert books.shape == (8, 16, 8)


def test_image_augment_reconstructs():
    """Augment stage: hflip variant equals the reversed-column source
    (flip twice == identity), crop variant equals the exact center
    slice with 3/4-side dims — byte-deterministic PNG both ways."""
    from crawlkit.synthweb import SynthWeb

    out = multimodal.image_augment(n=6).to_pandas()
    assert len(out) == 12 and set(out["aug"]) == {"hflip", "crop"}
    web = SynthWeb("t1")
    by_key = out.set_index(["image_id", "aug"])
    for iid in out["image_id"].unique()[:3]:
        rec = web.image_record(iid)
        px = imagecodec.decode(rec["bytes"], rec["fmt"])
        h, w = px.shape[0], px.shape[1]
        fl = imagecodec.decode_png(by_key.loc[(iid, "hflip"), "bytes"])
        assert np.array_equal(fl[:, ::-1], px)
        ch, cw = max(1, h * 3 // 4), max(1, w * 3 // 4)
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        cr = imagecodec.decode_png(by_key.loc[(iid, "crop"), "bytes"])
        assert cr.shape == (ch, cw, 3)
        assert np.array_equal(cr, px[y0:y0 + ch, x0:x0 + cw])
        assert by_key.loc[(iid, "crop"), "w"] == cw


def test_image_letterbox_reconstructs():
    """Letterbox: output is square, the centered inner region equals the
    decoded source exactly, and the border is the constant fill."""
    from crawlkit.synthweb import SynthWeb

    out = multimodal.image_letterbox(n=5).to_pandas().set_index("image_id")
    assert len(out) == 5
    web = SynthWeb("t1")
    for iid in list(out.index)[:3]:
        rec = web.image_record(iid)
        px = imagecodec.decode(rec["bytes"], rec["fmt"])
        r = out.loc[iid]
        cv = imagecodec.decode_png(r["bytes"])
        side = int(r["side"])
        assert cv.shape == (side, side, 3) and side == max(px.shape[:2])
        y0, x0 = int(r["pad_y"]), int(r["pad_x"])
        assert np.array_equal(cv[y0:y0 + px.shape[0], x0:x0 + px.shape[1]], px)
        mask = np.ones((side, side), dtype=bool)
        mask[y0:y0 + px.shape[0], x0:x0 + px.shape[1]] = False
        assert (cv[mask] == 114).all()


def test_emb_quantize_constant_dim(tmp_path):
    """The range-0 guard: a dimension constant across the corpus codes 0
    everywhere (no divide-by-zero), and a 2-value dimension codes
    exactly {0, 255} — the endpoints of the int8 range."""
    import duckdb
    import pyarrow.parquet as pq

    from crawlkit.pipelines.ann import emb_quantize_int8

    vecs = np.array(
        [[0.5, 0.1, -1.0], [0.5, 0.9, -1.0], [0.5, 0.4, 2.0]], dtype=np.float32
    )
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array([0, 0, 1], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = emb_quantize_int8(str(tmp_path)).to_pandas()
    const = got[got["dim"] == 0]
    assert (const["code"] == 0).all()
    dim2 = got[got["dim"] == 2].set_index("vec_id")["code"]
    assert dim2[0] == 0 and dim2[1] == 0 and dim2[2] == 255
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["emb_quantize_int8"]).df()
    g = got.sort_values(["vec_id", "dim"]).reset_index(drop=True)
    w = want.sort_values(["vec_id", "dim"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g[sorted(g.columns)], w[sorted(w.columns)])


def test_image_blur_screen_drops_on_defocus():
    """Variance-of-Laplacian: a 3x3 box-filtered copy scores strictly
    lower than the original, moments match a numpy re-derivation, and
    the sharp flag follows tau."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawlkit.synthweb import SynthWeb

    web = SynthWeb("t1")
    rec = web.image_record("img-mm-1")
    px = imagecodec.decode(rec["bytes"]).astype(np.int64)
    # 3x3 box blur (edge-clamped via cumulative trick is overkill: crop)
    box = sum(
        px[1 + dy : px.shape[0] - 1 + dy, 1 + dx : px.shape[1] - 1 + dx]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ) // 9
    blurred = imagecodec.encode_png(box.astype(np.uint8))
    t = pa.table(
        {
            "image_id": ["orig", "blur"],
            "bytes": pa.array([rec["bytes"], blurred], pa.binary()),
            "fmt": ["png", "png"],
        }
    )
    out = multimodal.ImageBlurScreen(tau_milli=1).__call__(t).to_pandas().set_index("image_id")
    assert out.loc["blur", "var_milli"] < out.loc["orig", "var_milli"] // 2
    # exact moment re-derivation for the original
    g = (77 * px[..., 0] + 150 * px[..., 1] + 29 * px[..., 2]) >> 8
    lap = 4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
    assert out.loc["orig", "lap_n"] == lap.size
    assert out.loc["orig", "lap_sum"] == lap.sum()
    assert out.loc["orig", "lap_sumsq"] == (lap * lap).sum()
    n, s, sq = lap.size, int(lap.sum()), int((lap * lap).sum())
    assert out.loc["orig", "var_milli"] == (1000 * (n * sq - s * s)) // (n * n)
    assert bool(out.loc["orig", "sharp"]) and bool(out.loc["blur", "sharp"])


def test_image_blur_screen_dataset_flags(ray_session):
    df = _pdf(multimodal.image_blur_screen(n=16))
    assert len(df) == 16
    assert df["sharp"].any() and (~df["sharp"]).any()  # tau splits the fixture


def test_assemble_image_corpus_matches_brute():
    """The image-side flagship composition (exact dedup → phash-cluster
    dedup → caption filter → split coin) must equal a brute-force Python
    reference over the same planted input_hint table — including the
    band-mining condition (a pair is found iff hamming ≤ τ AND a 16-bit
    band matches) and min-id representative election."""
    import itertools

    import numpy as np

    from crawlkit.hashing import hash64_np
    from crawlkit.pipelines import multimodal as mm

    n, pp, pcs, tau, min_tok = 32, 4, 3, 10, 8
    imgs = mm.synthetic_images(n, plant_pairs=pp, plant_exact=pcs).to_pandas()

    # exact losers: all but min image_id per identical byte payload
    drop = set()
    for _, grp in imgs.groupby(imgs["bytes"].map(bytes)):
        ids = sorted(grp["image_id"])
        drop.update(ids[1:])

    # near-dup: pairs iff hamming ≤ tau AND some 16-bit band equal;
    # components keep their min id
    ph = {r.image_id: np.uint64(np.int64(r.phash)) for r in imgs.itertuples()}
    adj = {i: set() for i in ph}
    for a, b in itertools.combinations(sorted(ph), 2):
        x = ph[a] ^ ph[b]
        ham = bin(int(x)).count("1")
        band_eq = any(
            (int(x) >> (16 * k)) & 0xFFFF == 0 for k in range(4)
        )
        if ham <= tau and band_eq:
            adj[a].add(b)
            adj[b].add(a)
    seen = set()
    for start in sorted(adj):
        if start in seen or not adj[start]:
            continue
        comp, stack = set(), [start]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x] - comp)
        seen |= comp
        drop.update(sorted(comp)[1:])

    # caption filter + split coin
    import re

    expected = {}
    for r in imgs.itertuples():
        if r.image_id in drop:
            continue
        toks = len(re.findall(r"\S+", r.caption))
        alpha = len(re.findall("[A-Za-z]", r.caption))
        if toks < min_tok or alpha * 100 < len(r.caption) * 50:
            continue
        bucket = int(hash64_np([r.image_id])[0] % np.uint64(100))
        split = "train" if bucket < 80 else ("val" if bucket < 90 else "test")
        expected[r.image_id] = (r.phash, toks, split)

    out = mm.assemble_image_corpus(
        n=n, plant_pairs=pp, plant_copies=pcs, max_hamming=tau, min_tokens=min_tok
    ).to_pandas()
    got = {
        r.image_id: (r.phash, r.n_cap_tokens, r.split) for r in out.itertuples()
    }
    assert got == expected
    assert len(expected) < len(imgs)  # composition is non-vacuous


def test_image_features_mixed_gif_rows():
    """png/jpeg/gif/bmp/tiff mixed corpus: every third row is a real
    GIF, i%5==1 among the rest is BMP, i%5==3 is TIFF (rotating
    compression), and the feature stage sniffs the container per row —
    every row's phash must equal the corpus column (features come from
    the same pixels the encoder embedded; BMP/TIFF are lossless
    re-encodes so their phash is unchanged)."""
    corpus = multimodal.synthetic_images_mixed(n=18).to_pandas()
    assert set(corpus["fmt"]) == {"png", "jpeg", "gif", "bmp", "tiff"}
    gif_rows = corpus[corpus["fmt"] == "gif"]
    assert len(gif_rows) == 6
    for blob in gif_rows["bytes"]:
        assert bytes(blob)[:6] in (b"GIF87a", b"GIF89a")
    bmp_rows = corpus[corpus["fmt"] == "bmp"]
    assert len(bmp_rows) == 3
    for blob in bmp_rows["bytes"]:
        assert bytes(blob)[:2] == b"BM"
    tiff_rows = corpus[corpus["fmt"] == "tiff"]
    assert len(tiff_rows) == 2
    for blob in tiff_rows["bytes"]:
        assert bytes(blob)[:4] == b"II\x2a\x00"
    feats = (
        multimodal.image_features_mixed(n=18).to_pandas().set_index("image_id")
    )
    assert len(feats) == 18
    for _, row in corpus.iterrows():
        assert feats.loc[row["image_id"], "phash"] == row["phash"]


def test_gif_frame_sample_compositing():
    """Animated-GIF frames: sampled rows reproduce the exact composited
    frame pixels the fixture animation was built from."""
    from crawlkit import gifcodec

    corpus = multimodal.synthetic_gif_animations(n=6).to_pandas()
    frames_df = (
        multimodal.gif_frame_sample(n=6, every_k=2)
        .to_pandas()
        .set_index(["gif_id", "frame_idx"])
        .sort_index()
    )
    assert (frames_df.index.get_level_values("frame_idx") >= 0).all()
    for _, row in corpus.iterrows():
        frames, delays, _ = gifcodec.decode_gif_frames(bytes(row["bytes"]))
        for fi in range(0, len(frames), 2):
            got = frames_df.loc[(row["gif_id"], fi)]
            assert got["delay_cs"] == delays[fi]
            assert np.array_equal(
                imagecodec.decode_png(bytes(got["frame_png"])), frames[fi]
            )


def test_gif_frame_sample_bad_payload_row():
    import pyarrow as pa

    stage = multimodal.GifFrameSample(every_k=1)
    t = pa.table({"gif_id": ["bad"], "bytes": [b"GIF89a\x00\x00garbage"]})
    out = stage(t).to_pylist()
    assert out == [
        {"gif_id": "bad", "frame_idx": -1, "delay_cs": 0, "frame_png": b""}
    ]


def test_avi_rle8_roundtrip_and_wire_format():
    """MS-RLE8 AVI: low-color frames survive losslessly (quantize is
    identity), the stream is biCompression=1 with a strf palette, and
    run-heavy frames compress vs raw DIB."""
    import struct

    from crawlkit import videocodec

    base = np.zeros((16, 20, 3), dtype=np.uint8)
    base[4:12, 5:15] = (200, 40, 90)
    base[:2] = (1, 2, 3)
    frames = [np.roll(base, f * 2, axis=1) for f in range(5)]
    data = videocodec.avi_encode(frames, fps=12, codec="rle8")
    i = data.index(b"strf")
    comp = struct.unpack("<I", data[i + 8 + 16 : i + 8 + 20])[0]
    assert comp == 1  # BI_RLE8
    got, fps = videocodec.avi_decode(data)
    assert fps == 12 and len(got) == 5
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)
    raw = videocodec.avi_encode(frames, fps=12, codec="raw")
    assert len(data) < len(raw) * 0.5


def test_rle8_escape_decoding():
    """Hand-built stream exercising every RLE8 escape: encoded run,
    absolute run (word-padded), EOL, delta skip, EOB."""
    from crawlkit.videocodec import rle8_decode_indices

    # 4x6 bitmap, bottom-up: build rows from the bottom
    stream = bytes(
        [
            3, 7,          # bottom row: 3 cells of palette 7
            0, 3, 1, 2, 3, 0,  # absolute run of 3 (1,2,3) + pad
            0, 0,          # EOL
            0, 2, 2, 1,    # delta: skip 2 right, 1 up (skipped cells stay 0)
            2, 9,          # then 2 cells of 9 on row y=1 (from x=2)
            0, 0,          # EOL
            6, 5,          # top row filled with 5
            0, 1,          # EOB
        ]
    )
    got = rle8_decode_indices(stream, 6, 4)
    exp = np.zeros((4, 6), dtype=np.uint8)
    exp[3, 0:3] = 7
    exp[3, 3:6] = (1, 2, 3)
    exp[1, 2:4] = 9
    exp[0, :] = 5
    assert np.array_equal(got, exp)
    with pytest.raises(ValueError):
        rle8_decode_indices(stream[:-2], 6, 4)  # no EOB


def test_bmp_8bit_palette_and_rle8():
    """8-bit BMPs: uncompressed palettized and BI_RLE8 both decode
    through the palette; paletteless 8-bit raises."""
    import struct

    from crawlkit.imagecodec import decode_bmp
    from crawlkit.videocodec import rle8_encode_indices

    pal = np.array([[10, 20, 30], [200, 100, 0], [0, 0, 255], [255, 255, 255]],
                   dtype=np.uint8)
    quads = np.zeros((4, 4), dtype=np.uint8)
    quads[:, :3] = pal[:, ::-1]  # RGBQUAD is BGRx
    idx = np.array([[0, 1, 1, 2, 2], [3, 3, 3, 0, 0], [1, 0, 2, 0, 3]], np.uint8)
    h, w = idx.shape

    def bmp(compression, pixdata):
        off = 54 + 16
        return (
            b"BM" + struct.pack("<IHHI", off + len(pixdata), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, compression,
                          len(pixdata), 0, 0, 4, 0)
            + quads.tobytes() + pixdata
        )

    stride = (w + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx[::-1]  # bottom-up
    assert np.array_equal(decode_bmp(bmp(0, rows.tobytes())), pal[idx])
    assert np.array_equal(decode_bmp(bmp(1, rle8_encode_indices(idx))), pal[idx])


def test_video_ops_over_rle8_corpus():
    """Scene-cut detection runs unchanged over the RLE8 corpus (the
    planted inversions dwarf quantization error)."""
    out = multimodal.video_scene_cuts("unused", n=9, codec="rle8").to_pandas()
    assert (out["frame_idx"] > 0).all()
    for i in range(9):
        v = out[out.video_id == f"vid-mm-{i}"]
        cuts = v[v.is_cut]["frame_idx"].tolist()
        nframes = 4 + (i % 5)
        assert cuts == ([nframes // 2] if i % 3 == 0 else []), (i, cuts)


def test_video_ops_over_mixed_corpus():
    """Per-row raw/mjpeg/rle8/mp4 video mix: all four containers
    present, planted cuts still found exactly, planted near-dup pairs
    still pair (dup rows share their base's codec)."""
    corpus = multimodal.synthetic_videos(9, codec="mixed").to_pandas()
    kinds = set()
    for b in corpus["bytes"]:
        bb = bytes(b)
        if bb[4:8] == b"ftyp":
            kinds.add("mp4")
        elif b"MJPG" in bb[:200]:
            kinds.add("mjpeg")
        elif b"MRLE" in bb[:200]:
            kinds.add("rle8")
        else:
            kinds.add("raw")
    assert kinds == {"raw", "mjpeg", "rle8", "mp4"}
    out = multimodal.video_scene_cuts("unused", n=9, codec="mixed").to_pandas()
    assert (out["frame_idx"] > 0).all()
    for i in range(9):
        v = out[out.video_id == f"vid-mm-{i}"]
        cuts = v[v.is_cut]["frame_idx"].tolist()
        nframes = 4 + (i % 5)
        assert cuts == ([nframes // 2] if i % 3 == 0 else []), (i, cuts)
    nd = multimodal.video_phash_neardup("unused", n=6, plant_pairs=2, codec="mixed")
    assert sorted(zip(nd["id_a"], nd["id_b"])) == [
        ("vid-mm-0", "vid-mm-0-dup"), ("vid-mm-1", "vid-mm-1-dup")
    ]
