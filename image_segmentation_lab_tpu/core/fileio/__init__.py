from .backend import HardDiskBackend
from .image_io import (imfrombytes, imread, imwrite, supported_backends,
                       use_backend)
from .io import dump, file_handlers, load, register_handler
from .parse import (dict_from_file, is_list_of, is_seq_of, is_tuple_of,
                    list_from_file, load_python_config, parse_and_backup_config,
                    require_config_key, select_device)
from .path import (check_file_exist, fopen, increment_path, is_filepath,
                   mkdir_or_exist, scandir)

__all__ = [
    "HardDiskBackend", "imfrombytes", "imread", "imwrite",
    "supported_backends", "use_backend", "dump",
    "file_handlers", "load", "register_handler", "dict_from_file",
    "is_list_of", "is_seq_of", "is_tuple_of", "list_from_file",
    "load_python_config", "parse_and_backup_config",
    "require_config_key", "select_device",
    "check_file_exist", "fopen", "increment_path", "is_filepath",
    "mkdir_or_exist", "scandir",
]
