"""API-docs build check: `docs/gen_api.py` regenerated into a temp dir
must exactly match the checked-in `docs/api/` tree.

This is the CI-equivalent of the reference's Sphinx build
(/root/reference/docs/conf.py, index.rst, pygradflow.rst): the docs are
generated from live signatures/docstrings, so any public-surface drift
(renamed class, changed signature, deleted docstring) fails here until
`env PYTHONPATH= python docs/gen_api.py` is re-run and committed.
"""

import os
import sys

DOCS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "docs")


def test_api_docs_in_sync(tmp_path):
    sys.path.insert(0, DOCS)
    try:
        import gen_api
    finally:
        sys.path.remove(DOCS)

    outdir = str(tmp_path / "api")
    gen_api.generate(outdir)

    checked_in = os.path.join(DOCS, "api")
    gen_names = sorted(os.listdir(outdir))
    assert gen_names == sorted(os.listdir(checked_in))
    for name in gen_names:
        with open(os.path.join(outdir, name)) as f:
            generated = f.read()
        with open(os.path.join(checked_in, name)) as f:
            committed = f.read()
        assert generated == committed, (
            f"docs/api/{name} is stale — run `env PYTHONPATH= python "
            "docs/gen_api.py` and commit the result"
        )


def test_index_links_resolve():
    api = os.path.join(DOCS, "api")
    with open(os.path.join(api, "index.md")) as f:
        index = f.read()
    import re

    for target in re.findall(r"\]\(([^)]+\.md)\)", index):
        if target.startswith("../"):
            path = os.path.join(api, target)
        else:
            path = os.path.join(api, target)
        assert os.path.exists(path), f"index.md links to missing {target}"
