"""CLI entry points mirroring the reference scripts (SURVEY.md §2.4).

Run as modules, e.g.:
    python -m diffuscene_tpu.cli.train_diffusion config.yaml out/
"""
