from camden_ray.cli import main

raise SystemExit(main())
