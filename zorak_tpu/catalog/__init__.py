from .discovery import (
    CatalogError, PluginSpec, discover, load_spec, match, select,
)
