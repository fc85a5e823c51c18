class NotAnalyzed(ValueError):
    """The image/object has not been analyzed yet (call .analyze() first)."""
