from medpy.metric import binary  # noqa: F401
