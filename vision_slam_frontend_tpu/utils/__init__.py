"""Host-side utilities: numpy geometry mirrors, timing, logging."""
