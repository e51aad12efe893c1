"""Shared helpers for the bench scripts: the cached measured reference
baseline (written once by ``measure_baseline.py``) and versioned JSON
artifacts under ``benchmarks/artifacts/``."""

import json
import os

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
BASELINE_PATH = os.path.join(ART, "baseline_reference.json")


def load_baseline(section=None):
    """The measured reference numbers, or None if never measured."""
    if not os.path.exists(BASELINE_PATH):
        return None
    with open(BASELINE_PATH) as f:
        data = json.load(f)
    return data.get(section) if section else data


def write_artifact(name, payload):
    os.makedirs(ART, exist_ok=True)
    path = os.path.join(ART, name)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    return path
