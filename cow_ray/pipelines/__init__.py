from .convert import convert_pages, ConvertConfig  # noqa: F401
