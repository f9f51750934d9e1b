"""A minimal PyQt6 stand-in for structural GUI tests.

PyQt6 is not installed in this environment (the GUI runs on the user's
workstation), so tests inject this stub into sys.modules before importing
scripts/gui.py. Every attribute resolves to one universal `_Stub` class:
it can be subclassed (QMainWindow/QWidget bases), instantiated with any
arguments, and any method/attribute access returns another stub. This
exercises the real control flow of the GUI code (state transitions, file
I/O, backend messages) with Qt rendering stubbed out.
"""
import sys
import types


class _StubMeta(type):

    def __getattr__(cls, name):
        return _Stub

    def __and__(cls, other):
        return 0

    def __rand__(cls, other):
        return 0


class _Stub(metaclass=_StubMeta):

    def __init__(self, *args, **kwargs):
        pass

    def __getattr__(self, name):
        return _Stub()

    def __call__(self, *args, **kwargs):
        return _Stub()

    def __and__(self, other):
        return 0

    def __rand__(self, other):
        return 0

    def __iter__(self):
        return iter(())


def _module(name):
    mod = types.ModuleType(name)
    # A real __file__ string and AttributeError on dunders keep
    # inspect.getmodule (which walks ALL of sys.modules, e.g. during
    # transformers imports in later tests) from choking on the stub.
    mod.__file__ = __file__

    def _getattr(attr):
        if attr.startswith('__'):
            raise AttributeError(attr)
        return _Stub

    mod.__getattr__ = _getattr
    return mod


def install():
    """Insert stub PyQt6 modules into sys.modules (idempotent)."""
    if 'PyQt6' in sys.modules and \
            getattr(sys.modules['PyQt6'], '_autolabel_stub', False):
        return
    pyqt6 = _module('PyQt6')
    pyqt6._autolabel_stub = True
    for sub in ('QtCore', 'QtGui', 'QtWidgets'):
        submod = _module(f'PyQt6.{sub}')
        setattr(pyqt6, sub, submod)
        sys.modules[f'PyQt6.{sub}'] = submod
    sys.modules['PyQt6'] = pyqt6
