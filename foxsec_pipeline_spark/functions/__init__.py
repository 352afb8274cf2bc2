from . import geo, net, text  # noqa: F401
