"""Web-document stages of the KG-construction pipeline (north-star
additions beyond the reference's relational scope): pages synthesis,
HTML->text extraction, mention detection, MinHash-LSH entity blocking,
connected-components canonicalization."""
