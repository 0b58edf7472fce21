"""Engine operators: parsing, selection, politeness, seen-set."""
