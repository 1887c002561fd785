from . import plugin_components  # noqa
