"""CLIP towers, BPE tokenizer, and the embedding index/search semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

from clearcam_tpu.models import clip
from clearcam_tpu.models.objects import (EmbeddingIndex, ObjectFinder,
                                         append_day_cache, read_day_cache)
from clearcam_tpu.utils.tokenizer import CLIPTokenizer, byte_encoder, split_words


def small_params():
    return clip.init_params(seed=0, img_blocks=2, txt_blocks=2)


def test_image_tower_shapes_and_norm():
    p = small_params()
    x = jnp.zeros((2, 224, 224, 3), jnp.uint8)
    emb = clip.encode_image(p, x)
    assert emb.shape == (2, 768)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0,
                               rtol=1e-3)


def test_text_tower_eot_pooling():
    p = small_params()
    toks = np.zeros((2, 77), np.int32)
    toks[0, 0], toks[0, 1], toks[0, 2] = 49406, 100, 49407
    toks[1, 0], toks[1, 1] = 49406, 49407
    emb = clip.encode_text(p, jnp.asarray(toks))
    assert emb.shape == (2, 768)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0,
                               rtol=1e-3)
    # different tokens -> different embeddings
    assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

def tiny_tokenizer():
    # synthetic merge table: "he", "ll", "hell", "hello</w>" style merges
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
              ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>")]
    return CLIPTokenizer(merges=merges)


def test_bpe_merging_and_roundtrip():
    tok = tiny_tokenizer()
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    # fully merged words produce single tokens
    assert len(ids) == 2


def test_split_words_pattern():
    assert split_words("it's 42 ok-ish!") == ["it", "'s", "4", "2", "ok", "-", "ish", "!"]


def test_encode_padded_layout():
    tok = tiny_tokenizer()
    ids = tok.encode_padded("hello")
    assert len(ids) == 77
    assert ids[0] == tok.sot_id and ids[2] == tok.eot_id and ids[3] == 0


def test_byte_encoder_reversible():
    be = byte_encoder()
    assert len(set(be.values())) == 256


# ---------------------------------------------------------------------------
# embedding index / search
# ---------------------------------------------------------------------------

def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_index_search_filters_and_dedup(tmp_path):
    idx = EmbeddingIndex()
    e1, e2, e3 = _unit([1, 0, 0]), _unit([0.9, 0.1, 0]), _unit([0, 1, 0])
    idx.rebuild({
        "data/cameras/cam1/objects/2026-08-16/10_5_0.jpg": e1,   # track 5
        "data/cameras/cam1/objects/2026-08-16/11_5_0.jpg": e2,   # track 5 (worse)
        "data/cameras/cam2/objects/2026-08-16/12_7_0.jpg": e3,   # track 7
    })
    q = _unit([1, 0, 0])
    res = idx.search(q, top_k=10)
    # best-per-track dedup: only one hit for track 5, ordered by score
    assert [r[0].split("/")[-1] for r in res] == ["10_5_0.jpg", "12_7_0.jpg"]
    # camera filter
    res = idx.search(q, top_k=10, cam="cam2")
    assert len(res) == 1 and "cam2" in res[0][0]
    # day filter admits "video"
    res = idx.search(q, top_k=10, day="2026-01-01")
    assert res == []


def test_day_cache_roundtrip(tmp_path):
    p = tmp_path / "embeddings.pkl"
    append_day_cache(p, "a.jpg", np.ones(4))
    append_day_cache(p, "b.jpg", np.zeros(4))
    data = read_day_cache(p)
    assert set(data) == {"a.jpg", "b.jpg"}


def test_object_finder_ingest_and_search(tmp_path):
    """End-to-end with a tiny random CLIP: ingest crops, reload from disk,
    search by image finds the matching crop first."""
    import cv2
    base = tmp_path / "cameras"
    finder = ObjectFinder(base_dir=base, weights_dir=tmp_path)
    finder.init_clip(params=small_params())

    day = base / "cam1" / "objects" / "2026-08-16"
    day.mkdir(parents=True)
    rng = np.random.default_rng(0)
    img_a = rng.integers(0, 255, (160, 160, 3), np.uint8)
    img_b = rng.integers(0, 255, (160, 160, 3), np.uint8)
    for i, img in enumerate([img_a, img_b]):
        path = day / f"{10 + i}_{i}_0.jpg"
        cv2.imwrite(str(path), img[..., ::-1])
        finder.ingest_crop(path, img)
    n = finder.load_all_embeddings()
    assert n == 2
    # query with crop A's bytes -> A ranks first
    ok, buf = cv2.imencode(".jpg", img_a[..., ::-1])
    res = finder.search_image(buf.tobytes(), top_k=2)
    assert res and res[0][0].endswith("10_0_0.jpg")
    assert res[0][1] > res[1][1]


def test_load_all_embeddings_incremental(tmp_path):
    """Unchanged day caches are not re-read; new/changed days are."""
    import pickle
    base = tmp_path / "cameras"
    finder = ObjectFinder(base_dir=base, weights_dir=tmp_path)
    day1 = base / "cam1" / "objects" / "2026-08-15"
    day1.mkdir(parents=True)
    append_day_cache(day1 / "embeddings.pkl", "a.jpg", _unit([1, 0, 0]))
    assert finder.load_all_embeddings() == 1

    reads = []
    orig = pickle.load

    def counting_load(f):
        reads.append(f.name)
        return orig(f)

    import clearcam_tpu.models.objects as objmod
    old = objmod.pickle.load
    objmod.pickle.load = counting_load
    try:
        assert finder.load_all_embeddings() == 1
        assert reads == []               # mtime unchanged -> no re-read
        day2 = base / "cam1" / "objects" / "2026-08-16"
        day2.mkdir(parents=True)
        append_day_cache(day2 / "embeddings.pkl", "b.jpg", _unit([0, 1, 0]))
        assert finder.load_all_embeddings() == 2
        assert any("2026-08-16" in r for r in reads)
        assert not any("2026-08-15" in r for r in reads)
    finally:
        objmod.pickle.load = old
    # deleted day drops out of the index
    import shutil
    shutil.rmtree(day2)
    assert finder.load_all_embeddings() == 1


def test_v1_embeddings_endpoint(tmp_path):
    """OpenAI /v1/embeddings over the CLIP text tower: unit-norm vectors
    in the search index's space; list + string inputs; 503 without CLIP;
    bad bodies 400. (server/http._post_v1_embeddings)"""
    import json
    import urllib.error
    import urllib.request

    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    from clearcam_tpu.runtime.settings import GlobalSettings

    finder = ObjectFinder(base_dir=tmp_path / "cameras",
                          weights_dir=tmp_path)
    finder.init_clip(params=small_params())
    finder._tok = tiny_tokenizer()

    def post(url, body):
        req = urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=60)

    ctx = AppContext(KVStore(":memory:"), tmp_path, object_finder=finder,
                     settings=GlobalSettings(use_clip=True))
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}/v1/embeddings"
    try:
        with post(url, {"input": ["hello world", "hello"]}) as r:
            out = json.loads(r.read())
        assert out["object"] == "list" and len(out["data"]) == 2
        for i, d in enumerate(out["data"]):
            assert d["index"] == i and d["object"] == "embedding"
            v = np.asarray(d["embedding"], np.float32)
            assert abs(np.linalg.norm(v) - 1.0) < 1e-3
        # string input ~== its list form (batch shape changes XLA's
        # summation order — tolerance, not bit equality) and matches
        # embed_text (same batch-1 graph) exactly
        with post(url, {"input": "hello world"}) as r:
            one = json.loads(r.read())["data"][0]["embedding"]
        assert np.allclose(one, out["data"][0]["embedding"], atol=1e-5)
        assert np.allclose(one, finder.embed_text("hello world"),
                           atol=1e-6)
        for bad in ({"input": []}, {"input": [1]},
                    {"input": "x", "encoding_format": "base64"}):
            try:
                post(url, bad)
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        server.shutdown()
    ctx2 = AppContext(KVStore(":memory:"), tmp_path,
                      settings=GlobalSettings(use_clip=True))
    server2 = serve(ctx2, port=0)
    try:
        post(f"http://127.0.0.1:{server2.server_address[1]}/v1/embeddings",
             {"input": "x"})
        raise AssertionError("expected 503")
    except urllib.error.HTTPError as e:
        assert e.code == 503
    finally:
        server2.shutdown()
