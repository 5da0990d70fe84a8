from .schedules import polynomial_decay
