"""Placeholder — queries land here."""
