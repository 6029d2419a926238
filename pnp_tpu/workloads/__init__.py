from .common import ScalarContext, make_scalar_context

__all__ = ["ScalarContext", "make_scalar_context"]
