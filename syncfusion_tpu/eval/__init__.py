"""Generation + evaluation harnesses (FAD, onset metrics, GT prep)."""
