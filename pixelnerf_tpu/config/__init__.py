from .hocon import ConfigTree, from_dict, parse_file, parse_string
from .args import parse_args

__all__ = ["ConfigTree", "from_dict", "parse_file", "parse_string", "parse_args"]
