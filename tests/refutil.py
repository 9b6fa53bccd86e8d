"""Import helper for the reference implementation at /root/reference.

The reference's ``sionna/__init__.py`` imports a ray-tracing stack (mitsuba,
drjit) that isn't installed here and is irrelevant to the quantum path.  We
stub those modules with permissive dummies so the FEC/channel modules import
cleanly on CPU TensorFlow, for golden-value generation only.
"""

import sys
import types


class _Stub:
    def __call__(self, *a, **k):
        return _Stub()

    def __getattr__(self, name):
        return _Stub()

    def __iter__(self):
        return iter([])

    # permissive operators so module-level expressions in sionna.rt evaluate
    def _binop(self, other):
        return _Stub()

    __matmul__ = __rmatmul__ = _binop
    __mul__ = __rmul__ = _binop
    __add__ = __radd__ = _binop
    __sub__ = __rsub__ = _binop
    __truediv__ = __rtruediv__ = _binop
    __getitem__ = lambda self, k: _Stub()  # noqa: E731


class _StubModule(types.ModuleType):
    def __getattr__(self, name):
        if name == "__path__":
            raise AttributeError(name)
        return _Stub()


_loaded = {}


def import_reference_sionna():
    """Import and return the reference sionna package (cached)."""
    if "sionna" in _loaded:
        return _loaded["sionna"]
    for m in ["mitsuba", "drjit", "pythreejs", "ipywidgets", "ipywidgets.embed"]:
        if m not in sys.modules:
            mod = _StubModule(m)
            mod.__path__ = []  # mark as package so submodule imports resolve
            sys.modules[m] = mod
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import sionna  # noqa: F401

    _loaded["sionna"] = sionna
    return sionna
