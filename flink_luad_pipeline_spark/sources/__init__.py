from .csv_io import (  # noqa: F401
    read_tsv,
    read_tsv_projected,
    resolve_output_path,
    write_tsv,
)
