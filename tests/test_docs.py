"""Doc pages are executable specs (reference parity: `@example` blocks with
embedded tests run in CI, `.github/workflows/CI.yml:79-86`): every python
code block in docs/*.md runs here, sharing one namespace per page."""

import os
import re

import pytest

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")

_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _pages():
    for name in sorted(os.listdir(DOCS)):
        if name.endswith(".md"):
            yield name


@pytest.mark.parametrize("page", list(_pages()))
def test_doc_page_examples_run(page):
    with open(os.path.join(DOCS, page)) as fh:
        text = fh.read()
    blocks = _BLOCK.findall(text)
    assert blocks, f"{page} has no python examples"
    namespace = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{page}[block {i}]", "exec"), namespace)
        except Exception as e:  # pragma: no cover
            pytest.fail(f"{page} block {i} failed: {type(e).__name__}: {e}")
