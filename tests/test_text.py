"""Text pipeline tests: relation classifier golden values, sentence
generation, embedding shapes, and a text-conditioned train step."""
import jax
import numpy as np

from diffuscene_tpu.data.text import (
    TextDescriptionGenerator,
    compute_rel,
    extract_relations,
    generate_sentences,
    get_article,
    num2words,
    word_tokenize,
)


def _box(cx, cy, cz, sx, sy, sz):
    return [cx - sx, cy - sy, cz - sz, cx + sx, cy + sy, cz + sz]


def test_compute_rel_golden():
    # object directly above another, footprint contained -> "above"
    assert compute_rel(_box(0, 2, 0, 0.2, 0.2, 0.2), _box(0, 0.2, 0, 1, 0.2, 1))[0] == "above"
    # resting on top (gap < 0.05) -> "on"
    assert compute_rel(_box(0, 0.42, 0, 1, 0.2, 1), _box(0, 0.0, 0, 2, 0.2, 2))[0] == "on"
    # to the +x side (theta ~ 0 from d=center1-center2) -> "right of"
    rel, dist = compute_rel(_box(2, 0, 0, 0.3, 0.3, 0.3), _box(0, 0, 0, 0.3, 0.3, 0.3))
    assert rel == "right of" and abs(dist - 2.0) < 1e-6
    # -x side -> "left of"
    assert compute_rel(_box(-2, 0, 0, 0.3, 0.3, 0.3), _box(0, 0, 0, 0.3, 0.3, 0.3))[0] == "left of"
    # +z side (x offset so the center is outside the other's x-range —
    # otherwise the reference's footprint early-return yields None) -> "in front of"
    assert compute_rel(_box(0.5, 0, 2, 0.1, 0.3, 0.3), _box(0, 0, 0, 0.3, 0.3, 0.3))[0] == "in front of"
    # -z side -> "behind"
    assert compute_rel(_box(0.5, 0, -2, 0.1, 0.3, 0.3), _box(0, 0, 0, 0.3, 0.3, 0.3))[0] == "behind"
    # straight ahead with x inside the other's x-range: reference returns None
    assert compute_rel(_box(0, 0, 2, 0.3, 0.3, 0.3), _box(0, 0, 0, 0.3, 0.3, 0.3))[0] is None
    # strictly containing footprint -> "surrounding" (outer center outside inner x-range)
    assert compute_rel(_box(0, 0, 0, 3, 0.3, 3), _box(1.0, 0, 0, 0.2, 0.3, 0.2))[0] == "surrounding"
    # vertical separation > 0.5 with footprint NOT contained -> None
    assert compute_rel(_box(2, 3, 0, 0.2, 0.2, 0.2), _box(0, 0, 0, 0.3, 0.3, 0.3))[0] is None


def test_helpers():
    assert num2words(2) == "two" and num2words(2, ordinal=True) == "second"
    assert get_article("armchair") == "an" and get_article("bed") == "a"
    toks = word_tokenize("The room has a bed , and two chairs .")
    assert toks == ["The", "room", "has", "a", "bed", ",", "and", "two", "chairs", "."]


def test_generate_sentences_eval_deterministic():
    rng = np.random.default_rng(0)
    names = ["double bed", "nightstand", "nightstand", "wardrobe"]
    trans = np.array([[0, 0, 0], [1.1, 0, 0], [-1.1, 0, 0], [0, 0, 1.4]], np.float32)
    sizes = np.array([[1, 0.3, 1], [0.3, 0.3, 0.3], [0.3, 0.3, 0.3], [0.4, 1, 0.4]], np.float32)
    rels = extract_relations(trans, sizes)
    assert len(rels) > 0
    s1 = generate_sentences(names, rels, rng, eval_mode=True)
    s2 = generate_sentences(names, rels, np.random.default_rng(7), eval_mode=True)
    assert s1 == s2  # eval mode is rng-independent
    assert s1[0].startswith("The room has ")
    assert "two nightstands" in s1[0]


def test_text_generator_full_sample():
    gen = TextDescriptionGenerator(
        ["double_bed", "nightstand", "wardrobe", "start", "end"], eval=True,
        max_token_length=50,
    )
    sample = {
        "class_labels": np.eye(5, dtype=np.float32)[[0, 1, 1]],
        "translations": np.array([[0, 0, 0], [1.1, 0, 0], [-1.1, 0, 0]], np.float32),
        "sizes": np.array([[1, 0.3, 1], [0.3, 0.3, 0.3], [0.3, 0.3, 0.3]], np.float32),
        "angles": np.zeros((3, 1), np.float32),
    }
    out = gen(sample, np.random.default_rng(0))
    assert isinstance(out["description"], str) and "bed" in out["description"]
    assert out["desc_emb"].shape == (50, 50)
    assert out["desc_emb"].dtype == np.float32
    # pad embedding rows are zero
    n_tok = len(word_tokenize(out["description"]))
    assert np.all(out["desc_emb"][n_tok:] == 0)


def test_text_conditioned_train_step():
    from diffuscene_tpu.models import SceneDiffusion, SceneModelConfig
    from diffuscene_tpu.train import Trainer

    net_kwargs = dict(
        dim=32, dim_mults=(1, 1), channels=62, objectness_dim=0,
        class_dim=22, angle_dim=2, objfeat_dim=32, context_dim=0,
        instanclass_dim=16, seperate_all=True, text_condition=True, text_dim=64,
    )
    cfg = SceneModelConfig(
        point_dim=62, class_dim=22, angle_dim=2, objectness_dim=0,
        objfeat_dim=32, sample_num_points=12, room_mask_condition=False,
        instance_condition=True, learnable_embedding=True, instance_emb_dim=16,
        text_condition=True, text_glove_embedding=True, text_embed_dim=64,
        model_mean_type="v", loss_separate=True, loss_iou=False, time_num=10,
        net_kwargs=tuple(sorted(net_kwargs.items())),
    )
    scene = SceneDiffusion(cfg)
    trainer = Trainer(scene, {"optimizer": "Adam", "lr": 1e-4, "schedule": "step",
                              "lr_step": 1000, "lr_decay": 0.5, "max_grad_norm": 10.0})
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 8  # divisible by the 8-device test mesh
    batch = {
        "translations": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, 12, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, 12, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, 12, 32)).astype(np.float32),
        "desc_emb": rng.normal(0, 1, (B, 50, 50)).astype(np.float32),
    }
    batch = trainer.put_batch(batch)
    assert "text_emb" in batch
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_text_emb_dim_flows_from_network_flags(tmp_path):
    """BERT-style configs (no glove/clip flag) must make the data pipeline
    emit 768-d token embeddings to match the model's fc_text_f input
    (regression: train CLI crashed with a (50,512) vs (768,512) shape error
    when the config implied BERT but the pipeline defaulted to GloVe-50)."""
    from diffuscene_tpu.data import make_synthetic_cached_dataset
    from diffuscene_tpu.data.factory import (
        get_dataset_raw_and_encoded, text_emb_dim_for_network,
    )

    assert text_emb_dim_for_network({}) == 768
    assert text_emb_dim_for_network({"text_glove_embedding": True}) == 50
    assert text_emb_dim_for_network({"text_clip_embedding": True}) == 512

    data_dir = str(tmp_path / "cached")
    make_synthetic_cached_dataset(data_dir, n_scenes=8, max_objects=12, seed=0)
    cfg = {
        "dataset_type": "cached_threedfront",
        "encoding_type": "cached_diffusion_text_cosin_angle_objfeatsnorm_lat32_wocm",
        "dataset_directory": data_dir,
        "annotation_file": data_dir + "/splits.csv",
        "train_stats": "dataset_stats.txt",
        "max_length": 12,
        "text_emb_dim": text_emb_dim_for_network({"text_condition": True}),
    }
    _, ds = get_dataset_raw_and_encoded(cfg, split=("train",))
    s = ds[0]
    assert s["desc_emb"].shape[-1] == 768


def test_apply_text_emb_dim_default():
    from diffuscene_tpu.data.factory import apply_text_emb_dim_default

    cfg = {"network": {"text_condition": True}, "data": {}}
    apply_text_emb_dim_default(cfg)
    assert cfg["data"]["text_emb_dim"] == 768
    cfg = {"network": {"text_condition": True, "text_glove_embedding": True}, "data": {}}
    apply_text_emb_dim_default(cfg)
    assert cfg["data"]["text_emb_dim"] == 50
    # explicit user setting wins
    cfg = {"network": {"text_condition": True}, "data": {"text_emb_dim": 50}}
    apply_text_emb_dim_default(cfg)
    assert cfg["data"]["text_emb_dim"] == 50
    # non-text configs untouched
    cfg = {"network": {}, "data": {}}
    apply_text_emb_dim_default(cfg)
    assert "text_emb_dim" not in cfg["data"]


def _tiny_bert(tmp_path):
    """Tiny randomly-initialized BERT + offline vocab (no downloads)."""
    from transformers import BertConfig, BertModel, BertTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "there", "is", "a", "bed", "and", "wardrobe", "."]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab) + "\n")
    tok = BertTokenizer(str(vocab_file), do_lower_case=True)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=37,
                     max_position_embeddings=64)
    model = BertModel(cfg)
    return tok, model


def _tiny_clip(tmp_path):
    """Tiny randomly-initialized CLIP text tower + offline BPE files."""
    import json as _json

    from transformers import CLIPTextConfig, CLIPTextModelWithProjection, CLIPTokenizer

    # minimal BPE vocab: specials + a few word-final tokens; everything else
    # falls back to the unk token, which is all a shape test needs
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1,
             "a</w>": 2, "bed</w>": 3, "room</w>": 4}
    (tmp_path / "vocab.json").write_text(_json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"))
    cfg = CLIPTextConfig(vocab_size=len(vocab), hidden_size=32,
                         intermediate_size=37, num_hidden_layers=2,
                         num_attention_heads=4, max_position_embeddings=77,
                         projection_dim=16)
    model = CLIPTextModelWithProjection(cfg)
    return tok, model


def test_precompute_bert_embeddings_offline(tmp_path):
    """Injected-tiny-model path of precompute_bert_embeddings (ADVICE r2)."""
    from diffuscene_tpu.data.text import precompute_bert_embeddings

    tok, model = _tiny_bert(tmp_path)
    out = precompute_bert_embeddings(
        ["there is a bed .", "a wardrobe and a bed"],
        max_token_length=12, tokenizer=tok, model=model)
    assert out.shape == (2, 12, 32) and out.dtype == np.float32
    assert np.isfinite(out).all()
    # deterministic for a fixed (frozen) model
    out2 = precompute_bert_embeddings(
        ["there is a bed .", "a wardrobe and a bed"],
        max_token_length=12, tokenizer=tok, model=model)
    np.testing.assert_array_equal(out, out2)


def test_precompute_clip_embeddings_offline(tmp_path):
    """Injected-tiny-model path of precompute_clip_text_embeddings; overlong
    descriptions truncate (intentional divergence from clip.tokenize)."""
    from diffuscene_tpu.data.text import precompute_clip_text_embeddings

    tok, model = _tiny_clip(tmp_path)
    descs = ["a bed room", "bed " * 200]  # second is way past 77 tokens
    out = precompute_clip_text_embeddings(
        descs, max_token_length=77, tokenizer=tok, model=model)
    assert out.shape == (2, 16) and out.dtype == np.float32  # (B, projection_dim)
    assert np.isfinite(out).all()
