"""Static-quality gate — the counterpart of the reference's Aqua.jl
`test_all` (ref test/runtests.jl:11-14: method ambiguities, unbound args,
undefined exports).  Python analogues checked here: every advertised
export resolves, every module imports, and public callables are
documented.  CI additionally runs ruff's undefined-name/syntax checks.
"""

import importlib
import inspect
import pathlib
import pkgutil

import implicitbvh_tpu as ib


def _iter_modules():
    pkg_dir = pathlib.Path(ib.__file__).parent
    for mod in pkgutil.walk_packages([str(pkg_dir)], prefix="implicitbvh_tpu."):
        yield mod.name


def test_all_modules_import():
    for name in _iter_modules():
        importlib.import_module(name)


def test_all_exports_resolve():
    assert ib.__all__, "package must advertise its API"
    for name in ib.__all__:
        assert getattr(ib, name, None) is not None, name


def test_public_api_documented():
    for name in ib.__all__:
        obj = getattr(ib, name)
        if callable(obj) or inspect.isclass(obj):
            assert (obj.__doc__ or "").strip(), f"{name} lacks a docstring"


def test_submodule_alls_resolve():
    for name in _iter_modules():
        mod = importlib.import_module(name)
        for export in getattr(mod, "__all__", []):
            assert getattr(mod, export, None) is not None, (name, export)
