"""Executable documentation: run every fenced python block in the docs.

Counterpart of the reference's jldoctest blocks, which Documenter executes
in CI (ref src/build.jl:47-99, src/traverse/traverse.jl:148-208,
docs/make.jl).  Blocks within one file share a namespace, in order, so
examples can build on earlier ones.
"""

import pathlib
import re

import pytest

DOCS = sorted(
    pathlib.Path(__file__).resolve().parent.parent.glob("docs/*.md")) + [
    pathlib.Path(__file__).resolve().parent.parent / "README.md"]

_FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(path):
    return _FENCE.findall(path.read_text())


@pytest.mark.parametrize(
    "path", [p for p in DOCS if p.exists() and _blocks(p)],
    ids=lambda p: p.name)
def test_doc_examples_run(path):
    ns = {}
    for i, block in enumerate(_blocks(path)):
        try:
            exec(compile(block, f"{path.name}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - diagnostic
            raise AssertionError(
                f"doc example failed in {path.name} block {i}: {e}\n"
                f"{block}") from e
