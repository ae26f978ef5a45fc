/* mmap the raw float32 predict outputs (same contract as the
 * reference's samples/load_bin.c). */
#include <fcntl.h>
#include <stdio.h>
#include <sys/mman.h>
#include <unistd.h>

#define D 70
#define H 370
#define W 1226

static float *map_file(const char *path, size_t n)
{
	int fd = open(path, O_RDONLY);
	float *p = mmap(NULL, n * sizeof(float), PROT_READ, MAP_SHARED, fd, 0);
	close(fd);
	return p;
}

int main(void)
{
	float *left = map_file("../left.bin", (size_t)1 * D * H * W);
	float *right = map_file("../right.bin", (size_t)1 * D * H * W);
	float *disp = map_file("../disp.bin", (size_t)1 * H * W);
	printf("disp[0]=%f left[0]=%f right[0]=%f\n", disp[0], left[0], right[0]);
	return 0;
}
