from . import attention, embed, geometric, heads, layers, rotary  # noqa: F401
