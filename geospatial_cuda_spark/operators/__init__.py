# Submodules are imported explicitly by consumers (keeps partial builds importable).
