from .convert import convert_pages, ConvertConfig  # noqa: F401
from .curate import curate_corpus  # noqa: F401
