from .concat import concat
from .each import each
from .filter import filter  # noqa: A004 - mirrors the reference's public name
from .flat_map import flat_map
from .from_iterable import from_iterable, from_iterable_source
from .map import map  # noqa: A004
from .observe import observe
from .map_rows import map_rows
from .ordered import ordered
from .run import run
from .to_iterable import to_iterable, to_async_iterable

__all__ = [
    "concat",
    "each",
    "filter",
    "flat_map",
    "from_iterable",
    "from_iterable_source",
    "map",
    "observe",
    "map_rows",
    "ordered",
    "run",
    "to_iterable",
    "to_async_iterable",
]
