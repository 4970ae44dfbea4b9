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
    # unbiased hash-sampled centroids measure 0.64-0.65 at sf0.001/0.01
    # (random gaussian vectors — the hard, clusterless case); 0.55 bar
    # leaves noise margin while pinning the r2 improvement over the old
    # head-of-file-biased sample
    assert np.mean(recalls) >= 0.55


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


def test_video_frame_sample_stub_plumbing():
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


def test_audio_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.AudioFeatures()(pa.table({"audio_id": ["a"], "bytes": [b""]}))


def test_image_phash_neardup_planted_pairs():
    """plant_pairs seeds LSB-perturbed near-dup images: the pipeline
    must find every planted pair (non-vacuous driver fixture)."""
    pairs = _pdf(multimodal.image_phash_neardup(n=16, max_hamming=10, plant_pairs=3))
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert {(f"img-mm-{i}", f"img-mm-{i}-dup") for i in range(3)} <= got
