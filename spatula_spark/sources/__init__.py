"""Sources: synthetic web/page-store generation + table loaders."""
