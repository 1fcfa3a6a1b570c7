"""Run the docstring examples of the major public classes as doctests —
the reference embeds a runnable example in essentially every class
(/root/reference/pycsou/func/penalty.py:29-47, linop/base.py:211-234);
this pins ours the same way (VERDICT r2 task 9)."""
import doctest

import jax
import pytest

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")


def _run(obj):
    finder = doctest.DocTestFinder(recurse=False)
    runner = doctest.DocTestRunner(optionflags=doctest.NORMALIZE_WHITESPACE)
    tests = finder.find(obj, name=obj.__name__)
    assert tests and any(t.examples for t in tests), f"{obj.__name__} has no docstring example"
    for t in tests:
        runner.run(t)
    assert runner.failures == 0, f"doctest failures in {obj.__name__}"


def test_operator_example():
    from pycsou_tpu.ops.conv import Convolve2D

    _run(Convolve2D)


def test_functional_example():
    from pycsou_tpu.func.penalty import L1Norm

    _run(L1Norm)


def test_solver_example():
    from pycsou_tpu.opt.proxalgs import PrimalDualSplitting

    _run(PrimalDualSplitting)


def test_flagship_example():
    from pycsou_tpu.opt.tv import TVDeconvolution

    _run(TVDeconvolution)


def test_distributed_solver_example():
    from pycsou_tpu.parallel.solvers import DistributedTVDeconv2D

    _run(DistributedTVDeconv2D)


# -- auto-discovery sweep (the reference's sphinx-doctest strategy, SURVEY
# §4: every docstring example in the package is executed) -------------------

def _package_modules():
    import pathlib

    import pycsou_tpu

    root = pathlib.Path(pycsou_tpu.__file__).parent
    names = []
    for p in sorted(root.rglob("*.py")):
        rel = p.relative_to(root.parent).with_suffix("")
        mod = ".".join(rel.parts)
        if mod.endswith("__init__"):
            mod = mod[: -len(".__init__")]
        names.append(mod)
    return names


@pytest.mark.parametrize("modname", _package_modules())
def test_module_doctests(modname):
    import importlib

    mod = importlib.import_module(modname)
    runner = doctest.testmod(
        mod, optionflags=doctest.NORMALIZE_WHITESPACE, verbose=False
    )
    assert runner.failed == 0, f"{runner.failed} doctest failures in {modname}"
