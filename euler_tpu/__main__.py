from euler_tpu.cli import main

main()
