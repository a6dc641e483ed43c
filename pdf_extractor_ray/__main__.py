from pdf_extractor_ray.cli import main

raise SystemExit(main())
