"""Every argparse flag of every reference script is accepted by the
corresponding repo CLI (drop-in compatibility).

The reference scripts are the authoritative CLI surface
(`/root/reference/scripts/*.py`); a user switching to this framework should
not have to rewrite their invocations.  Flags the reference parses but never
uses (e.g. --background in preprocess, --scene_texture) are accepted here
too, documented as compatibility flags in their help strings.
"""
import os
import re

import pytest

REFERENCE = "/root/reference/scripts"
REPO_CLI = os.path.join(os.path.dirname(__file__), os.pardir,
                        "diffuscene_tpu", "cli")

# reference script -> (repo cli module(s) whose parsers together must accept
# every reference flag)
MAPPING = {
    "train_diffusion.py": ["train_diffusion.py"],
    "generate_diffusion.py": ["generate_diffusion.py", "_scene_output.py"],
    "completion_rearrange.py": ["completion_rearrange.py", "_scene_output.py"],
    "train_objautoencoder.py": ["train_objautoencoder.py"],
    "generate_objautoencoder.py": ["generate_objautoencoder.py"],
    "preprocess_data.py": ["preprocess_data.py"],
    "pickle_threed_fucture_dataset.py": ["pickle_threed_future_dataset.py"],
    "pickle_threed_fucture_pointcloud.py": ["pickle_threed_future_pointcloud.py"],
    "compute_fid_scores.py": ["compute_fid_scores.py"],
    "improved_precision_recall.py": ["improved_precision_recall.py"],
}

# option strings: every quoted --flag inside an add_argument call
_FLAG_RE = re.compile(r"add_argument\(\s*((?:['\"]--?[\w\-]+['\"]\s*,?\s*)+)")
_OPT_RE = re.compile(r"['\"](--[\w\-]+)['\"]")


def _flags(path):
    out = set()
    with open(path) as f:
        src = f.read()
    for m in _FLAG_RE.finditer(src):
        out.update(_OPT_RE.findall(m.group(1)))
    return out


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference checkout")
@pytest.mark.parametrize("ref_script", sorted(MAPPING))
def test_reference_flags_accepted(ref_script):
    ref_flags = _flags(os.path.join(REFERENCE, ref_script))
    repo_flags = set()
    for mod in MAPPING[ref_script]:
        repo_flags |= _flags(os.path.join(REPO_CLI, mod))
    missing = sorted(ref_flags - repo_flags)
    assert not missing, (
        f"{ref_script}: reference flags not accepted by "
        f"{MAPPING[ref_script]}: {missing}")


_POS_RE = re.compile(r"add_argument\(\s*['\"]([a-zA-Z][\w]*)['\"]")


def _positionals(path):
    """Ordered positional names, metavar winning over dest when present."""
    src = open(path).read()
    out = []
    for m in _POS_RE.finditer(src):
        tail = src[m.end(): m.end() + 400]
        # stop at the end of this call (first line starting a new statement)
        mv = re.search(r"metavar\s*=\s*['\"]([\w]+)['\"]", tail.split("add_argument")[0])
        out.append(mv.group(1) if mv else m.group(1))
    return out


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference checkout")
@pytest.mark.parametrize("ref_script", sorted(MAPPING))
def test_reference_positionals_accepted(ref_script):
    """Reference positional-argument order is honored (drop-in invocations
    pass paths positionally, not only by flag)."""
    ref_pos = _positionals(os.path.join(REFERENCE, ref_script))
    repo_pos = []
    for mod in MAPPING[ref_script]:
        repo_pos += _positionals(os.path.join(REPO_CLI, mod))
    assert repo_pos[: len(ref_pos)] == ref_pos, (
        f"{ref_script}: positionals {ref_pos} vs repo {repo_pos}")


def test_pointcloud_cli_n_points_alias():
    """--n_points (the repo's historical name) still parses as an alias of
    the reference's --pointcloud_size."""
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--pointcloud_size", "--n_points", type=int,
                        default=30000, dest="pointcloud_size")
    assert parser.parse_args(["--n_points", "123"]).pointcloud_size == 123
    assert parser.parse_args(["--pointcloud_size", "7"]).pointcloud_size == 7
