#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Dependency-free approximation of the flake8 gate for hosts without it.

CI runs real black/flake8/mypy (`make check`); development machines without
those tools installed can still catch the high-frequency findings — unused
imports (F401), overlong lines (E501 at the configured 100 columns), bare
excepts (E722), trailing whitespace (W291/W293), and f-strings without
placeholders (F541) — before pushing. Not a replacement for the CI gate.
"""
import ast
import configparser
import os
import sys

MAX_LINE = 100
TARGETS = [
    "ffsubsync_tpu", "tests", "scripts",
    "bench.py", "__graft_entry__.py", "setup.py",
]


def per_file_ignores(root):
    """Honor setup.cfg's [flake8] per-file-ignores so this gate agrees
    with real flake8 on a clean checkout (e.g. the literal .ass fixture
    lines exempted from E501)."""
    cfg = configparser.ConfigParser()
    cfg.read(os.path.join(root, "setup.cfg"))
    raw = cfg.get("flake8", "per-file-ignores", fallback="")
    ignores = {}
    for entry in raw.split("\n"):
        entry = entry.split("#", 1)[0].strip()
        if ":" not in entry:
            continue
        path, codes = entry.rsplit(":", 1)
        ignores[path.strip()] = {c.strip() for c in codes.split(",") if c.strip()}
    return ignores


def iter_py(root):
    for target in TARGETS:
        path = os.path.join(root, target)
        if os.path.isfile(path):
            yield path
        else:
            for dirpath, _dirnames, filenames in os.walk(path):
                if "__pycache__" in dirpath:
                    continue
                for fn in sorted(filenames):
                    if fn.endswith(".py") and fn != "_version.py":
                        yield os.path.join(dirpath, fn)


class ImportUsage(ast.NodeVisitor):
    def __init__(self):
        self.imported = {}  # name -> (lineno, statement repr)
        self.used = set()

    def visit_Import(self, node):
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self.imported[name] = node.lineno

    def visit_ImportFrom(self, node):
        for alias in node.names:
            if alias.name == "*":
                continue
            self.imported[alias.asname or alias.name] = node.lineno

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path):
    problems = []
    with open(path, encoding="utf-8") as f:
        src = f.read()
    for i, line in enumerate(src.splitlines(), 1):
        if len(line) > MAX_LINE:
            problems.append((i, "E501 line too long (%d > %d)" % (len(line), MAX_LINE)))
        if line != line.rstrip():
            problems.append((i, "W291 trailing whitespace"))
    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        return [(e.lineno or 0, "E999 syntax error: %s" % e.msg)]
    usage = ImportUsage()
    usage.visit(tree)
    # names referenced anywhere (incl. inside strings for __all__/doctests
    # would be overkill; check real Name loads only, plus noqa escapes)
    lines = src.splitlines()
    for name, lineno in sorted(usage.imported.items()):
        if name in usage.used or name == "__future__":
            continue
        line = lines[lineno - 1] if lineno <= len(lines) else ""
        if "noqa" in line:
            continue
        # conservative: a bare mention anywhere (docstring examples, strings
        # passed to jit static names) keeps the import
        if sum(s.count(name) for s in lines) > 1:
            continue
        problems.append((lineno, "F401 '%s' imported but unused" % name))
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            line = lines[node.lineno - 1] if node.lineno <= len(lines) else ""
            if "noqa" not in line:
                problems.append((node.lineno, "E722 bare except"))
        if isinstance(node, ast.JoinedStr) and not any(
            isinstance(v, ast.FormattedValue) for v in node.values
        ):
            problems.append((node.lineno, "F541 f-string without placeholders"))
    return problems


def main():
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    ignores = per_file_ignores(root)
    total = 0
    for path in iter_py(root):
        rel = os.path.relpath(path, root)
        skip = ignores.get(rel.replace(os.sep, "/"), set())
        for lineno, msg in check_file(path):
            if msg.split()[0] in skip:
                continue
            print("%s:%d: %s" % (rel, lineno, msg))
            total += 1
    print("%d finding(s)" % total, file=sys.stderr)
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main())
