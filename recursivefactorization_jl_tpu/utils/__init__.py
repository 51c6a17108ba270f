from . import config, perm  # noqa: F401
