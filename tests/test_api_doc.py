"""docs/API.md drift guard: every module, symbol, call signature, and
console script the doc names must resolve against the live package
(VERDICT r04 item 6 — MIGRATING.md's import-verified pattern, applied
to the API reference). Quick tier: pure imports + inspect, no device
work. A failing row here means the doc says something the package no
longer provides — fix the doc or restore the symbol.
"""

import ast
import configparser
import inspect
import re
from pathlib import Path

import pytest

import image_captioning_through_rl_tpu as pkg

DOC = Path(__file__).resolve().parent.parent / "docs" / "API.md"
MD = DOC.read_text()

# Doc-local variable roots that are never created by an executable
# import line: map them to the object whose attributes the doc calls.
ALIASES = {
    "icrl": pkg,
    "cap": "image_captioning_through_rl_tpu.api:Captioner",
    "ext": "image_captioning_through_rl_tpu.api:FeatureExtractor",
}


def _load(spec):
    if not isinstance(spec, str):
        return spec
    import importlib

    modname, _, attr = spec.partition(":")
    obj = importlib.import_module(modname)
    return getattr(obj, attr) if attr else obj


def _code_blocks():
    return re.findall(r"```python\n(.*?)```", MD, re.S)


def _resolve_chain(node, ns):
    """Resolve an ast.Attribute/Name chain against ``ns``; returns
    (dotted_name, obj) or None when the root is a doc-local variable
    the block assigns (params, mesh, toks, ...)."""
    parts = []
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if not isinstance(node, ast.Name) or node.id not in ns:
        return None
    obj = ns[node.id]
    dotted = node.id
    for attr in reversed(parts):
        dotted += f".{attr}"
        assert hasattr(obj, attr), f"API.md names `{dotted}` but " \
            f"{type(obj).__name__} `{dotted.rsplit('.', 1)[0]}` has no " \
            f"attribute `{attr}`"
        obj = getattr(obj, attr)
    return dotted, obj


def test_code_blocks_resolve_and_signatures_accept_doc_kwargs():
    """Every import line executes; every dotted call target resolves;
    every keyword argument the doc shows is accepted by the live
    signature (or swallowed by **kwargs)."""
    checked = 0
    for block in _code_blocks():
        ns = {k: _load(v) for k, v in ALIASES.items()}
        tree = ast.parse(block)
        for stmt in tree.body:
            if isinstance(stmt, (ast.Import, ast.ImportFrom)):
                exec(compile(ast.Module([stmt], []), "<API.md>", "exec"), ns)
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            hit = _resolve_chain(node.func, ns)
            if hit is None:
                continue  # root is a block-local variable, not a symbol
            dotted, fn = hit
            checked += 1
            try:
                sig = inspect.signature(fn)
            except (TypeError, ValueError):
                continue
            params = sig.parameters
            has_var_kw = any(p.kind is p.VAR_KEYWORD for p in params.values())
            for kw in node.keywords:
                if kw.arg is None or has_var_kw:
                    continue
                assert kw.arg in params, (
                    f"API.md calls `{dotted}(... {kw.arg}=...)` but the live "
                    f"signature is {dotted}{sig}")
    assert checked >= 15  # the doc's call surface; guards the parser itself


def _expand_braces(ref):
    m = re.search(r"\{([^}]*)\}", ref)
    if not m:
        return [ref]
    head, tail = ref[: m.start()], ref[m.end():]
    return [v for alt in m.group(1).split(",")
            for v in _expand_braces(head + alt + tail)]


def test_inline_pkg_refs_resolve():
    """Every backticked `pkg.<dotted>` reference (brace sets expanded)
    resolves to a module or attribute of the package."""
    import importlib

    refs = re.findall(r"`(pkg(?:\.[\w{},]+)+)`", MD)
    assert len(refs) >= 15
    for raw in refs:
        for ref in _expand_braces(raw):
            path = ref.split(".")[1:]
            obj, dotted = pkg, pkg.__name__
            for part in path:
                dotted += f".{part}"
                if hasattr(obj, part):
                    obj = getattr(obj, part)
                else:
                    try:
                        obj = importlib.import_module(dotted)
                    except ImportError:
                        pytest.fail(f"API.md names `{ref}` but `{dotted}` "
                                    "is neither an attribute nor a module")


_SKIP_TOKENS = {
    # prose-level backticks that are not package symbols
    "pkg", "jax.Array", "file:line", "init", "forward",
    "python -m image_captioning_through_rl_tpu.server",
}


def _paragraph_bases(section_mod, paragraph):
    """Resolution bases for a bare token: the section's module, ALL its
    on-disk submodules (pkgutil — data.pca etc. are not re-exported by
    their package __init__), any dotted pkg refs in the same paragraph,
    the package/api roots, and any CLASS the paragraph itself names
    (`Captioner` puts `caption_tokens` in scope)."""
    import importlib
    import pkgutil

    bases = []
    if section_mod is not None:
        bases.append(section_mod)
        if hasattr(section_mod, "__path__"):
            for info in pkgutil.iter_modules(section_mod.__path__):
                try:
                    bases.append(importlib.import_module(
                        f"{section_mod.__name__}.{info.name}"))
                except ImportError:
                    pass
        bases += [getattr(section_mod, a) for a in dir(section_mod)
                  if inspect.ismodule(getattr(section_mod, a))]
    for raw in re.findall(r"`(pkg(?:\.[\w{},]+)+)`", paragraph):
        for ref in _expand_braces(raw):
            try:
                bases.append(importlib.import_module(
                    pkg.__name__ + ref[len("pkg"):]))
            except ImportError:
                pass
    bases.append(pkg)
    bases.append(_load("image_captioning_through_rl_tpu.api"))
    for tok in re.findall(r"`([A-Z]\w*)`", paragraph):
        for base in bases:
            cls = getattr(base, tok, None)
            if inspect.isclass(cls):
                bases.append(cls)
                break
    return bases


def _walk_token(base, parts):
    """Resolve dotted ``parts`` against ``base``, importing non-exported
    submodules on the way (`postprocess.post_process_data` under a
    metrics section must not depend on metrics/__init__ re-exports)."""
    import importlib

    obj = base
    for p in parts:
        if hasattr(obj, p):
            obj = getattr(obj, p)
        elif inspect.ismodule(obj):
            try:
                obj = importlib.import_module(f"{obj.__name__}.{p}")
            except ImportError:
                return False
        else:
            return False
    return True


def test_inline_symbols_resolve_in_section_scope():
    """Bare backticked identifiers (`load_data`, `make_reward_step`,
    `VerifiedDispatch`, `postprocess.post_process_data`, ...) resolve
    against their section's module, a module named in the same
    paragraph, or the package root."""
    import importlib

    sections = re.split(r"^## ", MD, flags=re.M)[1:]
    checked, missing = 0, []
    for sec in sections:
        header, body = sec.split("\n", 1)
        m = re.search(r"\(`pkg((?:\.\w+)+)`\)", header)
        section_mod = None
        if m:
            try:
                section_mod = importlib.import_module(pkg.__name__ + m.group(1))
            except ImportError:
                missing.append(f"section module pkg{m.group(1)}")
        body = re.sub(r"```.*?```", "", body, flags=re.S)  # blocks: other test
        for paragraph in body.split("\n\n"):
            bases = None
            for tok in re.findall(r"`([A-Za-z_][\w.]*)`", paragraph):
                if (tok in _SKIP_TOKENS or tok.startswith("pkg.")
                        or re.search(r"\.(md|py|cpp|txt|json|pt|ckpt)$", tok)):
                    continue
                if bases is None:
                    bases = _paragraph_bases(section_mod, paragraph)
                parts = tok.split(".")
                for base in bases:
                    if _walk_token(base, parts):
                        checked += 1
                        break
                else:
                    missing.append(tok)
    assert not missing, f"API.md names unresolvable symbols: {missing}"
    assert checked >= 40


def test_console_scripts_exist_and_import():
    """Every console script API.md lists exists in pyproject.toml and
    its entry point imports and exposes the named function."""
    import importlib

    pyproject = (Path(__file__).resolve().parent.parent
                 / "pyproject.toml").read_text()
    m = re.search(r"\[project\.scripts\](.*?)(?:\n\[|\Z)", pyproject, re.S)
    assert m, "pyproject.toml has no [project.scripts] table"
    cp = configparser.ConfigParser()
    cp.read_string("[s]\n" + m.group(1))
    scripts = {k: v.strip().strip('"') for k, v in cp.items("s")}

    doc_scripts = set(re.findall(r"`((?:icrl|image)-[\w-]+)`", MD))
    assert doc_scripts >= {"image-captioner", "image-caption-server",
                           "icrl-caption", "icrl-verify-reference"}
    for name in sorted(doc_scripts):
        assert name in scripts, f"API.md lists `{name}` but pyproject " \
            f"[project.scripts] has {sorted(scripts)}"
        modname, _, fn = scripts[name].partition(":")
        mod = importlib.import_module(modname)
        assert hasattr(mod, fn), f"{scripts[name]} does not resolve"
