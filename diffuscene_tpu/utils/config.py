"""YAML config loading + experiment provenance.

Equivalent of reference `scripts/training_utils.py:15-52`: `load_config`
reads the same YAML schema (sections data / network / feature_extractor /
training / validation / logger), `save_experiment_params` dumps args + git
hash + merged config to params.json.
"""
from __future__ import annotations

import json
import os
import random
import string
import subprocess
from typing import Any, Dict

import yaml

try:
    from yaml import CLoader as _Loader
except ImportError:  # pragma: no cover
    from yaml import Loader as _Loader


def load_config(config_file: str) -> Dict[str, Any]:
    with open(config_file, "r") as f:
        return yaml.load(f, Loader=_Loader)


def id_generator(size: int = 6, chars=string.ascii_uppercase + string.digits) -> str:
    return "".join(random.choice(chars) for _ in range(size))


def save_experiment_params(args, experiment_tag: str, directory: str):
    params = {k: str(v) for k, v in vars(args).items()}
    git_head_hash = "unknown"
    try:
        git_head_hash = subprocess.check_output(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.realpath(__file__)),
            stderr=subprocess.DEVNULL,
        ).strip().decode()
    except (subprocess.CalledProcessError, OSError):
        pass
    params["git-commit"] = git_head_hash
    params["experiment_tag"] = experiment_tag
    for k, v in list(params.items()):
        if v == "":
            params[k] = None
    if hasattr(args, "config_file") and args.config_file:
        params.update(load_config(args.config_file))
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "params.json"), "w") as f:
        json.dump(params, f, indent=4)


def yield_forever(iterator):
    while True:
        for x in iterator:
            yield x
