"""Golden parity of the host data-encoding pipeline vs the LIVE reference
decorator stack (`threed_front_dataset.py:228-1072`), loaded standalone from
the read-only checkout.  Skipped when the checkout is absent.

Covers, on a shared synthetic fixture:
- the `dataset_encoding_factory` chain for the encoding_type variants the
  shipped configs use (diffusion cosin_angle/objfeatsnorm/lat32/lat64,
  plain-Scale, eval rewrites, autoregressive wocm) — encoded arrays equal
- random augmentations with pinned draws (rotation via an injected angle,
  permutation / WOCM prefix via np.random seed replay)
- `post_process` inverses (threed_front_dataset.py:403-417, 515-535)
- `_parse_train_stats` bounds parsing (threed_front.py:383-415)
- the text pipeline: compute_rel branch sweep (utils_text.py:5-55),
  get_article over the furniture vocabulary against a real-pronunciation
  cmudict stub, and full Add_Text eval-mode descriptions + GloVe-shape
  embeddings token-for-token (threed_front_dataset.py:637-819)

Unavailable third-party packages (torchtext / nltk / num2words /
simple_3dviz / trimesh) are stubbed for import only; every stub that could
influence compared OUTPUTS (cmudict pronunciations, the tokenizer, the
embedding table) is pinned to real data or shared between both sides so the
comparison exercises the reference's logic, not the stubs.
"""
import importlib.machinery
import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

REF_DS_DIR = "/root/reference/scene_synthesis/datasets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DS_DIR), reason="reference checkout not available"
)

# ---------------------------------------------------------------------------
# shared deterministic embedding table (used by BOTH the reference GloVe stub
# and our pipeline, so desc_emb comparison tests token selection + padding)
# ---------------------------------------------------------------------------
from diffuscene_tpu.data.text import HashedEmbedder

_SHARED_EMB = HashedEmbedder(50)

# real CMU-dict first pronunciations for the furniture vocabulary (first
# words after clean_obj_name) + ordinal prefixes; a word's article is "an"
# iff its first phoneme carries a stress digit (utils_text.py:71-78)
_PRONUNCIATIONS = {
    "armchair": [["AA1", "R", "M", "CH", "EH2", "R"]],
    "bookshelf": [["B", "UH1", "K", "SH", "EH2", "L", "F"]],
    "cabinet": [["K", "AE1", "B", "AH0", "N", "AH0", "T"]],
    "ceiling": [["S", "IY1", "L", "IH0", "NG"]],
    "chair": [["CH", "EH1", "R"]],
    "chaise": [["SH", "EY1", "Z"]],
    "children": [["CH", "IH1", "L", "D", "R", "AH0", "N"]],
    "chinese": [["CH", "AY0", "N", "IY1", "Z"]],
    "coffee": [["K", "AA1", "F", "IY0"]],
    "console": [["K", "AA1", "N", "S", "OW0", "L"]],
    "corner": [["K", "AO1", "R", "N", "ER0"]],
    "desk": [["D", "EH1", "S", "K"]],
    "dining": [["D", "AY1", "N", "IH0", "NG"]],
    "double": [["D", "AH1", "B", "AH0", "L"]],
    "dressing": [["D", "R", "EH1", "S", "IH0", "NG"]],
    "kids": [["K", "IH1", "D", "Z"]],
    "l": [["EH1", "L"]],
    "lazy": [["L", "EY1", "Z", "IY0"]],
    "lounge": [["L", "AW1", "N", "JH"]],
    "loveseat": [["L", "AH1", "V", "S", "IY2", "T"]],
    "multi": [["M", "AH1", "L", "T", "IY0"]],
    "nightstand": [["N", "AY1", "T", "S", "T", "AE2", "N", "D"]],
    "pendant": [["P", "EH1", "N", "D", "AH0", "N", "T"]],
    "round": [["R", "AW1", "N", "D"]],
    "second": [["S", "EH1", "K", "AH0", "N", "D"]],
    "shelf": [["SH", "EH1", "L", "F"]],
    "single": [["S", "IH1", "NG", "G", "AH0", "L"]],
    "sofa": [["S", "OW1", "F", "AH0"]],
    "stool": [["S", "T", "UW1", "L"]],
    "table": [["T", "EY1", "B", "AH0", "L"]],
    "third": [["TH", "ER1", "D"]],
    "wardrobe": [["W", "AO1", "R", "D", "R", "OW2", "B"]],
    "wine": [["W", "AY1", "N"]],
}


def _simple_word_tokenize(s):
    """nltk.word_tokenize equivalent on the template sentences (words made of
    letters/hyphens, standalone punctuation).  Used as the nltk stub on the
    reference side; our side uses diffuscene_tpu.data.text.word_tokenize, so
    tokenizer agreement is part of the comparison."""
    import re

    return re.findall(r"[A-Za-z][A-Za-z\-']*|\d+|[^\w\s]", s)


def _stub_module(name):
    """ModuleType with a (loader-less) __spec__ so later
    `importlib.util.find_spec(name)` calls — e.g. transformers'
    `_is_package_available` — return the spec instead of raising
    `ValueError: <name>.__spec__ is None` on the already-imported stub."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def _install_stubs():
    """Import-only stubs for packages absent in this environment."""
    if "torchtext" in sys.modules:
        return
    import torch

    class _GloVeStub:
        def __init__(self, name=None, dim=50, cache=None):
            self.dim = dim

        def __getitem__(self, token):
            return torch.from_numpy(np.asarray(_SHARED_EMB(token)))

    torchtext = _stub_module("torchtext")
    torchtext.vocab = types.SimpleNamespace(GloVe=_GloVeStub)
    sys.modules["torchtext"] = torchtext

    n2w = _stub_module("num2words")
    # independent inline table (NOT the one in diffuscene_tpu.data.text)
    _CARD = ("zero one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen seventeen eighteen "
             "nineteen twenty").split()
    _ORD = ("zeroth first second third fourth fifth sixth seventh eighth "
            "ninth tenth eleventh twelfth thirteenth fourteenth fifteenth "
            "sixteenth seventeenth eighteenth nineteenth twentieth").split()
    n2w.num2words = lambda n, ordinal=False: (_ORD if ordinal else _CARD)[n]
    sys.modules["num2words"] = n2w

    nltk = _stub_module("nltk")
    nltk_tok = _stub_module("nltk.tokenize")
    nltk_tok.word_tokenize = _simple_word_tokenize
    nltk_corpus = _stub_module("nltk.corpus")
    nltk_corpus.cmudict = types.SimpleNamespace(dict=lambda: dict(_PRONUNCIATIONS))
    nltk.tokenize = nltk_tok
    nltk.corpus = nltk_corpus
    sys.modules["nltk"] = nltk
    sys.modules["nltk.tokenize"] = nltk_tok
    sys.modules["nltk.corpus"] = nltk_corpus

    # dead imports in threed_front.py / threed_front_scene.py.  tkinter may
    # already be present — real, or a partial stub from test_convert*.py
    # (which installs W but not E) — so ensure the names rather than replace.
    tk = sys.modules.get("tkinter")
    if tk is None:
        tk = _stub_module("tkinter")
        sys.modules["tkinter"] = tk
    for attr in ("E", "W"):
        if not hasattr(tk, attr):
            setattr(tk, attr, None)
    sys.modules.setdefault("trimesh", _stub_module("trimesh"))
    s3 = _stub_module("simple_3dviz")
    for name in ("Lines", "Mesh", "Spherecloud"):
        setattr(s3, name, type(name, (), {}))
    s3_tm = _stub_module("simple_3dviz.renderables.textured_mesh")
    s3_tm.Material = type("Material", (), {})
    s3_tm.TexturedMesh = type("TexturedMesh", (), {})
    s3_kb = _stub_module("simple_3dviz.behaviours.keyboard")
    s3_kb.SnapshotOnKey = type("SnapshotOnKey", (), {})
    s3_misc = _stub_module("simple_3dviz.behaviours.misc")
    s3_misc.LightToCamera = type("LightToCamera", (), {})
    sys.modules["simple_3dviz"] = s3
    sys.modules["simple_3dviz.renderables"] = _stub_module("simple_3dviz.renderables")
    sys.modules["simple_3dviz.renderables.textured_mesh"] = s3_tm
    sys.modules["simple_3dviz.behaviours"] = _stub_module("simple_3dviz.behaviours")
    sys.modules["simple_3dviz.behaviours.keyboard"] = s3_kb
    sys.modules["simple_3dviz.behaviours.misc"] = s3_misc


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"refds.{name}", os.path.join(REF_DS_DIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"refds.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def refds():
    pytest.importorskip("torch")
    _install_stubs()
    if "refds" not in sys.modules:
        pkg = types.ModuleType("refds")
        pkg.__path__ = [REF_DS_DIR]
        sys.modules["refds"] = pkg
    if "refds.threed_front_dataset" not in sys.modules:
        _load("utils_text")
        _load("threed_front_dataset")
    return sys.modules["refds.threed_front_dataset"]


# ---------------------------------------------------------------------------
# shared synthetic fixture
# ---------------------------------------------------------------------------

TYPES = ["armchair", "double_bed", "nightstand", "wardrobe", "l_shaped_sofa",
         "coffee_table", "pendant_lamp", "tv_stand"]
CLASS_LABELS = TYPES + ["start", "end"]
NC = len(CLASS_LABELS)
MAX_LENGTH = 12


def _make_rooms(n=6, seed=3):
    rng = np.random.default_rng(seed)
    rooms = []
    for _ in range(n):
        L = int(rng.integers(3, 9))
        cls = rng.integers(0, len(TYPES), L)
        onehot = np.zeros((L, NC), np.float32)
        onehot[np.arange(L), cls] = 1.0
        rooms.append({
            "room_layout": rng.random((1, 16, 16)).astype(np.float32),
            "class_labels": onehot,
            "translations": rng.uniform(-2.5, 2.5, (L, 3)).astype(np.float32),
            "sizes": rng.uniform(0.1, 1.5, (L, 3)).astype(np.float32),
            "angles": rng.uniform(-np.pi, np.pi, (L, 1)).astype(np.float32),
            "objfeats": rng.normal(0, 1, (L, 64)).astype(np.float32),
            "objfeats_32": rng.normal(0, 1, (L, 32)).astype(np.float32),
        })
    return rooms


def _bounds_dict(rooms):
    t = np.concatenate([r["translations"] for r in rooms])
    s = np.concatenate([r["sizes"] for r in rooms])
    a = np.concatenate([r["angles"] for r in rooms])
    f64 = np.concatenate([r["objfeats"] for r in rooms])
    f32 = np.concatenate([r["objfeats_32"] for r in rooms])
    return {
        "translations": (t.min(0).astype(np.float64), t.max(0).astype(np.float64)),
        "sizes": (s.min(0).astype(np.float64), s.max(0).astype(np.float64)),
        "angles": (np.array(float(a.min())), np.array(float(a.max()))),
        "objfeats": (np.array([float(f64.std())]), np.array([float(f64.min())]),
                     np.array([float(f64.max())])),
        "objfeats_32": (np.array([float(f32.std())]), np.array([float(f32.min())]),
                        np.array([float(f32.max())])),
    }


class _FakeCached:
    """Duck-typed CachedThreedFront (threed_front.py:274-440) over the
    in-memory fixture; returns fresh copies because the reference decorators
    mutate samples in place."""

    def __init__(self, rooms, bounds):
        self._rooms = rooms
        self._bounds = bounds

    def __len__(self):
        return len(self._rooms)

    def get_room_params(self, i):
        return {k: v.copy() for k, v in self._rooms[i].items()}

    def __getitem__(self, i):
        return self.get_room_params(i)

    @property
    def bounds(self):
        return self._bounds

    @property
    def class_labels(self):
        return CLASS_LABELS

    @property
    def n_classes(self):
        return NC

    @property
    def object_types(self):
        return TYPES

    @property
    def class_frequencies(self):
        return {t: 1.0 / len(TYPES) for t in TYPES}

    @property
    def max_length(self):
        return MAX_LENGTH

    @property
    def bbox_dims(self):
        return 3 + 3 + 1

    def post_process(self, s):
        return s


def _ours_bounds(bd):
    from diffuscene_tpu.data.encoding import Bounds

    return Bounds(
        translations=bd["translations"],
        sizes=bd["sizes"],
        angles=bd["angles"],
        objfeats=bd["objfeats"],
        objfeats_32=bd["objfeats_32"],
    )


def _build_ours(name, bd, seed=0, **kw):
    from diffuscene_tpu.data.encoding import build_encoding

    return build_encoding(
        name, _ours_bounds(bd), MAX_LENGTH, CLASS_LABELS,
        {t: 1.0 / len(TYPES) for t in TYPES}, seed=seed, **kw)


@pytest.fixture(scope="module")
def fixture():
    rooms = _make_rooms()
    return rooms, _bounds_dict(rooms)


def _assert_sample_equal(ref_out, our_out, keys=None, atol=0.0):
    keys = keys or sorted(set(ref_out) & set(our_out) - {"description"})
    for k in keys:
        r, o = np.asarray(ref_out[k]), np.asarray(our_out[k])
        assert r.shape == o.shape, f"{k}: {r.shape} vs {o.shape}"
        np.testing.assert_allclose(o, r, rtol=0, atol=atol, err_msg=k)


# ---------------------------------------------------------------------------
# 1. deterministic encoding variants: encoded arrays equal
# ---------------------------------------------------------------------------

ENCODING_NAMES = [
    # the shipped-config flagship encoding (train, permutation off)
    "cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm_no_prm",
    # its eval rewrite: scaled, unpadded
    "cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm_eval",
    # lat64 objfeats
    "cached_diffusion_objfeats_cosin_angle_objfeatsnorm_wocm_no_prm",
    # plain Scale path: min/max-scaled angles, objfeats untouched
    "cached_diffusion_lat32_wocm_no_prm",
]


@pytest.mark.parametrize("name", ENCODING_NAMES)
def test_encoding_arrays_match(refds, fixture, name):
    rooms, bd = fixture
    ref_chain = refds.dataset_encoding_factory(name, _FakeCached(rooms, bd))
    ours = _build_ours(name, bd)
    for i in range(len(rooms)):
        ref_out = ref_chain[i]
        our_out = ours(rooms[i])
        assert set(k for k in ref_out if k != "description") == \
            set(k for k in our_out if k != "description")
        _assert_sample_equal(ref_out, our_out)


def test_length_key_matches(refds, fixture):
    rooms, bd = fixture
    name = ENCODING_NAMES[0]
    ref_chain = refds.dataset_encoding_factory(name, _FakeCached(rooms, bd))
    ours = _build_ours(name, bd)
    for i in range(len(rooms)):
        assert int(ref_chain[i]["length"]) == int(ours(rooms[i])["length"])


# ---------------------------------------------------------------------------
# 2. pinned random augmentations
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("angle", [0.0, 0.7, np.pi, np.pi * 1.5, 5.0])
def test_rotation_augmentation_matches(refds, fixture, angle):
    from diffuscene_tpu.data.encoding import apply_rotation

    rooms, bd = fixture
    fake = _FakeCached(rooms, bd)
    collection = refds.OrderedDataset(
        refds.CachedDatasetCollection(fake),
        ["class_labels", "translations", "sizes", "angles", "objfeats_32"],
        box_ordering=None)

    class _PinnedRot(refds.RotationAugmentation):
        @property
        def rot_angle(self):
            return angle

    chain = refds.Diffusion(refds.Scale_CosinAngle_ObjfeatsNorm(_PinnedRot(collection)))
    name = ENCODING_NAMES[0]
    ours = _build_ours(name, bd)
    for i in range(len(rooms)):
        ref_out = chain[i]
        rotated = apply_rotation(rooms[i], angle, bd["angles"])
        our_out = ours(rotated)
        # scipy rotate output is identical; everything downstream exact
        _assert_sample_equal(ref_out, our_out, atol=1e-6)


def test_permutation_matches_with_seed_replay(refds, fixture):
    """Permutation (threed_front_dataset.py:570-584) draws one
    np.random.permutation; replaying the global seed pins the ordering."""
    rooms, bd = fixture
    name = "cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm"
    ref_chain = refds.dataset_encoding_factory(name, _FakeCached(rooms, bd))
    ours_no_prm = _build_ours(name + "_no_prm", bd)
    for i in range(len(rooms)):
        L = rooms[i]["class_labels"].shape[0]
        np.random.seed(100 + i)
        ordering = np.random.permutation(L)
        np.random.seed(100 + i)
        ref_out = ref_chain[i]
        permuted = dict(rooms[i])
        for k in ("class_labels", "translations", "sizes", "angles", "objfeats_32"):
            permuted[k] = permuted[k][ordering]
        our_out = ours_no_prm(permuted)
        _assert_sample_equal(ref_out, our_out)
        # objfeats (lat64) is NOT in the lat32 permute-key list — the
        # reference leaves it unpermuted (threed_front_dataset.py:1037-1042)
        np.testing.assert_array_equal(
            ref_out["objfeats"][:L], ours_no_prm(rooms[i])["objfeats"][:L])


def test_autoregressive_wocm_matches_with_seed_replay(refds, fixture):
    rooms, bd = fixture
    name = "cached_autoregressive_cosin_angle_objfeatsnorm_lat32_wocm_no_prm"
    ref_chain = refds.dataset_encoding_factory(name, _FakeCached(rooms, bd))
    ours = _build_ours(name, bd)

    class _PinnedRng:
        def __init__(self, value):
            self.value = value

        def integers(self, lo, hi):
            assert lo <= self.value < hi
            return self.value

    for i in range(len(rooms)):
        L = rooms[i]["class_labels"].shape[0]
        np.random.seed(200 + i)
        n_boxes = int(np.random.randint(0, L + 1))
        np.random.seed(200 + i)
        ref_out = ref_chain[i]
        ours._rng = _PinnedRng(n_boxes)
        our_out = ours(rooms[i])
        assert int(ref_out["length"]) == int(our_out["length"]) == n_boxes
        _assert_sample_equal(ref_out, our_out)


# ---------------------------------------------------------------------------
# 3. post_process inverses
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", [
    "cached_diffusion_cosin_angle_objfeatsnorm_lat32_wocm_no_prm",
    "cached_diffusion_lat32_wocm_no_prm",
])
def test_post_process_matches(refds, fixture, name):
    rooms, bd = fixture
    ref_chain = refds.dataset_encoding_factory(name, _FakeCached(rooms, bd))
    ours = _build_ours(name, bd)
    rng = np.random.default_rng(11)
    B, N = 4, MAX_LENGTH
    angle_c = 2 if "cosin_angle" in name else 1
    batch = {
        "class_labels": rng.uniform(-1, 1, (B, N, NC - 1)).astype(np.float32),
        "translations": rng.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, N, angle_c)).astype(np.float32),
        "objfeats_32": rng.uniform(-1, 1, (B, N, 32)).astype(np.float32),
    }
    ref_out = ref_chain.post_process({k: v.copy() for k, v in batch.items()})
    our_out = ours.post_process({k: v.copy() for k, v in batch.items()})
    assert set(ref_out) == set(our_out)  # plain Scale DROPS objfeats keys
    _assert_sample_equal(ref_out, our_out)


# ---------------------------------------------------------------------------
# 4. dataset_stats parsing (threed_front.py:383-415)
# ---------------------------------------------------------------------------

def test_parse_train_stats_matches(refds, fixture, tmp_path):
    from diffuscene_tpu.data.encoding import Bounds

    rooms, bd = fixture
    stats = {
        "bounds_translations": [float(x) for x in
                                np.concatenate([bd["translations"][0], bd["translations"][1]])],
        "bounds_sizes": [float(x) for x in np.concatenate([bd["sizes"][0], bd["sizes"][1]])],
        "bounds_angles": [float(bd["angles"][0]), float(bd["angles"][1])],
        "bounds_objfeats": [float(x[0]) for x in bd["objfeats"]],
        "bounds_objfeats_32": [float(x[0]) for x in bd["objfeats_32"]],
        "class_labels": CLASS_LABELS,
        "object_types": TYPES,
        "class_frequencies": {t: 1.0 / len(TYPES) for t in TYPES},
        "class_order": {t: i for i, t in enumerate(TYPES)},
        "count_furniture": {t: 5 for t in TYPES},
    }
    (tmp_path / "dataset_stats.txt").write_text(json.dumps(stats))

    ref_tf = _load("threed_front")
    obj = ref_tf.CachedThreedFront.__new__(ref_tf.CachedThreedFront)
    obj._base_dir = str(tmp_path)
    obj.config = {}
    obj._parse_train_stats("dataset_stats.txt")

    mine = Bounds.from_train_stats(stats)
    np.testing.assert_array_equal(np.asarray(obj._centroids[0]), mine.translations[0])
    np.testing.assert_array_equal(np.asarray(obj._centroids[1]), mine.translations[1])
    np.testing.assert_array_equal(np.asarray(obj._sizes[0]), mine.sizes[0])
    np.testing.assert_array_equal(np.asarray(obj._sizes[1]), mine.sizes[1])
    np.testing.assert_array_equal(np.asarray(obj._angles[0]), mine.angles[0])
    np.testing.assert_array_equal(np.asarray(obj._angles[1]), mine.angles[1])
    for ref_t, mine_t in ((obj._objfeats, mine.objfeats),
                          (obj._objfeats_32, mine.objfeats_32)):
        for r, m in zip(ref_t, mine_t):
            np.testing.assert_array_equal(np.asarray(r, np.float64),
                                          np.asarray(m, np.float64))
    # defaults when the keys are absent (threed_front.py:399-400, 406-407)
    stats2 = {k: v for k, v in stats.items()
              if k not in ("bounds_objfeats", "bounds_objfeats_32")}
    (tmp_path / "dataset_stats.txt").write_text(json.dumps(stats2))
    obj._parse_train_stats("dataset_stats.txt")
    mine2 = Bounds.from_train_stats(stats2)
    for ref_t, mine_t in ((obj._objfeats, mine2.objfeats),
                          (obj._objfeats_32, mine2.objfeats_32)):
        for r, m in zip(ref_t, mine_t):
            np.testing.assert_array_equal(np.asarray(r, np.float64),
                                          np.asarray(m, np.float64))


# ---------------------------------------------------------------------------
# 5. text: compute_rel branch sweep, get_article, Add_Text eval chain
# ---------------------------------------------------------------------------

# box = [x0, y0, z0, x1, y1, z1]; each pair targets one classifier branch
_REL_PAIRS = [
    # on: center1 in box2 footprint, gap in (0, 0.05)
    ([0.2, 1.02, 0.2, 0.8, 1.52, 0.8], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # above: gap > 0.05
    ([0.2, 1.6, 0.2, 0.8, 2.1, 0.8], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # in-footprint but overlapping vertically -> None
    ([0.2, 0.2, 0.2, 0.8, 0.8, 0.8], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # |dy| > 0.5 outside footprint -> None
    ([3.0, 2.0, 0.0, 4.0, 3.0, 1.0], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # surrounding (box1 contains box2 in xz, center1 outside box2 footprint)
    ([-5.0, 0.0, -5.0, 9.0, 1.0, 9.0], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # would-be "inside" is unreachable (center1 falls in box2 footprint);
    # both sides must take the footprint path
    ([0.3, 0.0, 0.3, 0.7, 0.4, 0.7], [0.0, -0.2, 0.0, 1.0, 1.2, 1.0]),
    # left of (theta ~ pi, disjoint)
    ([-4.0, 0.0, 0.0, -3.0, 1.0, 1.0], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # right touching (theta ~ pi, small overlap)
    ([-0.9, 0.0, 0.0, 0.1, 1.0, 1.0], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # right of (theta ~ 0, disjoint)
    ([3.0, 0.0, 0.0, 4.0, 1.0, 1.0], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # left touching (theta ~ 0, small overlap)
    ([0.9, 0.0, 0.0, 1.9, 1.0, 1.0], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # NOTE: center1-x inside box2's x-range short-circuits to the footprint
    # branch regardless of z (utils_text.py:19-27 early return) — behind/
    # front pairs must keep center1-x OUTSIDE [ox0, ox1] to reach the
    # direction classifier.
    # behind (theta ~ -69 deg, disjoint)
    ([1.5, 0.0, -4.0, 2.5, 1.0, -3.0], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # behind touching (theta ~ -71 deg, small xz overlap)
    ([0.55, 0.0, -2.4, 1.55, 1.0, 0.2], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # in front of (theta ~ 67 deg, disjoint)
    ([1.5, 0.0, 3.0, 2.5, 1.0, 4.0], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # front touching (theta ~ 71 deg, small xz overlap)
    ([0.55, 0.0, 0.8, 1.55, 1.0, 3.4], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
    # dead zone theta in [pi/6, pi/3) -> None
    ([3.0, 0.0, 3.0, 4.0, 1.0, 4.0], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]),
]


def test_compute_rel_branch_sweep(refds):
    from diffuscene_tpu.data.text import compute_rel as mine

    ref_ut = sys.modules["refds.utils_text"]
    seen = set()
    for box1, box2 in _REL_PAIRS:
        want_rel, want_dist = ref_ut.compute_rel(box1, box2)
        got_rel, got_dist = mine(box1, box2)
        assert got_rel == want_rel, (box1, box2)
        np.testing.assert_allclose(got_dist, want_dist, rtol=1e-12)
        seen.add(want_rel)
    # branch coverage: every emitted relation type is exercised
    assert {"on", "above", "surrounding", "left of", "right of", "behind",
            "in front of", "right touching", "left touching",
            "behind touching", "front touching", None} <= seen


def test_get_article_matches_cmudict(refds):
    from diffuscene_tpu.data.text import get_article as mine

    ref_ut = sys.modules["refds.utils_text"]
    words = sorted(_PRONUNCIATIONS) + ["second armchair", "third nightstand",
                                       "l shaped sofa", "dressing table"]
    for w in words:
        assert mine(w) == ref_ut.get_article(w), w


def test_add_text_eval_chain_matches(refds, fixture):
    """Full textfix (eval) chain: relations -> sentences -> tokens ->
    embeddings are deterministic in eval mode; compare description strings
    and desc_emb arrays token-for-token (threed_front_dataset.py:637-819)."""
    rooms, bd = fixture
    name = "cached_diffusion_textfix_cosin_angle_objfeatsnorm_lat32_wocm_no_prm"
    ref_chain = refds.dataset_encoding_factory(name, _FakeCached(rooms, bd))
    ours = _build_ours(name, bd)
    ours._text_encoder.embedder = _SHARED_EMB  # same table as the GloVe stub
    got_nonempty_rel = False
    for i in range(len(rooms)):
        ref_out = ref_chain[i]
        our_out = ours(rooms[i])
        assert our_out["description"] == ref_out["description"], i
        np.testing.assert_array_equal(our_out["desc_emb"], ref_out["desc_emb"])
        _assert_sample_equal(ref_out, our_out,
                             keys=["class_labels", "translations", "sizes",
                                   "angles", "objfeats_32"])
        if len(ref_out["description"]) > 20:
            got_nonempty_rel = True
    assert got_nonempty_rel  # the fixture produced real sentences


def test_add_relation_matches(refds, fixture):
    """Relation extraction over every fixture scene (unscaled coordinates),
    vs Add_Text.add_relation (threed_front_dataset.py:658-686)."""
    from diffuscene_tpu.data.text import extract_relations

    rooms, bd = fixture
    fake = _FakeCached(rooms, bd)
    collection = refds.CachedDatasetCollection(fake)
    add_text = refds.Add_Text(collection, eval=True)
    for i in range(len(rooms)):
        ref_rel = add_text.add_relation(fake.get_room_params(i))["relations"]
        our_rel = extract_relations(rooms[i]["translations"], rooms[i]["sizes"])
        assert len(ref_rel) == len(our_rel)
        for (rn, rr, ro, rd), (on_, or_, oo, od) in zip(ref_rel, our_rel):
            assert (rn, rr, ro) == (on_, or_, oo)
            np.testing.assert_allclose(od, rd, rtol=1e-12)
