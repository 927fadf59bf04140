"""Sources: synthetic corpus generator + sitemap XML discovery."""
